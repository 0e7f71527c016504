"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, public spec).

DataStats' exact path reduces every distinct 64-bit value hash to the
driver — O(total distinct) driver memory, fine for categorical profiling
but wrong for a 10^9-cardinality id column on a 100-TB run. The HLL path
bounds the reduced state at ``2^p`` registers per column (p=14 -> 16384
registers, ~1.04/sqrt(m) ≈ 0.8% standard error) regardless of data size:
per-batch registers are emitted as (col, register, rho) rows for only the
NONZERO registers and merged with grouped_reduce(max) — the same
driver-small reduction machinery every other stat fit uses.
"""

from __future__ import annotations

import numpy as np

P = 14
M = 1 << P


def hll_partial(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nonzero (register_index, rho) pairs for one batch of uint64 hashes."""
    if len(hashes) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - P)) - 1)
    # rho = leading-zero count of the (64-p)-bit remainder + 1
    nbits = np.zeros(len(rest), dtype=np.int64)
    nz = rest > 0
    # exact bit length via frexp: every rest < 2^50 is float64-exact, and
    # frexp's exponent IS the bit length (log2 can round up at 2^k - 1)
    nbits[nz] = np.frexp(rest[nz].astype(np.float64))[1].astype(np.int64)
    rho = (64 - P) - nbits + 1
    reg = np.zeros(M, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    nzr = np.flatnonzero(reg)
    return nzr, reg[nzr]


def hll_estimate(reg_idx: np.ndarray, reg_rho: np.ndarray) -> float:
    """Cardinality estimate from merged nonzero registers (idx unique).
    Register index -1 is the all-null-batch sentinel (carries null/row
    counts through the reduction) — not a register; drop it here."""
    reg_idx = np.asarray(reg_idx, dtype=np.int64)
    reg_rho = np.asarray(reg_rho, dtype=np.float64)
    real = reg_idx >= 0
    reg = np.zeros(M, dtype=np.float64)
    reg[reg_idx[real]] = reg_rho[real]
    alpha = 0.7213 / (1 + 1.079 / M)
    e = alpha * M * M / np.sum(np.power(2.0, -reg))
    zeros = M - np.count_nonzero(reg)
    if zeros > 0:
        lc = M * np.log(M / zeros)
        # linear counting is near-unbiased while a few % of registers stay
        # empty (n <~ 4m); the raw estimator has its known high bias in
        # exactly that transition region (HLL++ fixes it with empirical
        # bias tables; LC-preference is the table-free version)
        if lc <= 4 * M:
            e = lc
    return float(e)
