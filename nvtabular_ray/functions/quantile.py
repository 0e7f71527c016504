"""Distributed EXACT quantiles by iterative histogram refinement.

The reference computes medians with Dask's approximate quantile
(/root/reference/nvtabular/ops/fill.py:116-119). We do better while staying
fully streaming: each round is one ``map_batches`` pass producing a
fixed-width histogram of the current candidate interval per (column, q)
target (a few KB per batch), merged on the driver; the interval containing
the target rank narrows ~4096x per round, so 2-3 rounds pinpoint the
quantile even at 10^12 rows. A final pass collects only the handful of
values left in the interval and interpolates exactly (pandas/DuckDB
'linear' semantics). Nothing but O(buckets) state ever leaves the workers.

Multiple q targets per column (``distributed_quantiles_multi``, used by
QuantileBucketize) share the same passes: every round histograms ALL active
(column, q) pairs at once, so k cut points cost the same number of dataset
scans as one.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type
from nvtabular_ray.ops.moments import column_moments

_NBUCKETS = 4096


def _clean_np(table: pa.Table, col: str) -> np.ndarray:
    arr = as_single_chunk(table.column(col))
    if is_list_type(arr.type):
        arr = arr.flatten()
    vals = pc.cast(arr.drop_null(), pa.float64()).to_numpy(zero_copy_only=False)
    return vals[~np.isnan(vals)]


def _quantiles_pairs(
    ds,
    pairs: list[tuple[str, float]],
    collect_threshold: int = 100_000,
    max_rounds: int = 8,
) -> dict[tuple[str, float], float]:
    """Exact linear-interpolation quantile per (column, q) pair. All pairs
    refine simultaneously: one histogram pass per round covers every active
    pair (the per-batch cleaned column is computed once per column)."""
    cols = list(dict.fromkeys(c for c, _ in pairs))
    stats = column_moments(ds, cols)
    state: dict[tuple[str, float], dict | None] = {}
    for c, q in pairs:
        st = stats[c]
        n = st["count"]
        if n == 0:
            state[(c, q)] = None
            continue
        pos = (n - 1) * q
        state[(c, q)] = {
            "lo": st["min"],
            "hi": st["max"],
            "below": 0,
            "r0": int(math.floor(pos)),
            "r1": int(math.ceil(pos)),
            "frac": pos - math.floor(pos),
            "n_range": n,
            "done": st["min"] == st["max"],
            "value": st["min"] if st["min"] == st["max"] else None,
        }

    results: dict[tuple[str, float], float] = {
        p: (None if s is None else s["value"])
        for p, s in state.items()
        if s is None or s.get("done")
    }
    idx_of = {p: i for i, p in enumerate(pairs)}

    for _ in range(max_rounds):
        active = [
            p
            for p, s in state.items()
            if s is not None and not s["done"] and s["n_range"] > collect_threshold
        ]
        if not active:
            break
        bounds = {p: (state[p]["lo"], state[p]["hi"]) for p in active}

        def hist_batch(t: pa.Table, bounds=bounds, active=tuple(active)) -> pa.Table:
            clean: dict[str, np.ndarray] = {}
            ids, hists = [], []
            for p in active:
                c, _q = p
                if c not in clean:
                    clean[c] = _clean_np(t, c)
                lo, hi = bounds[p]
                v = clean[c]
                v = v[(v >= lo) & (v <= hi)]
                h, _ = np.histogram(v, bins=_NBUCKETS, range=(lo, hi))
                ids.append(idx_of[p])
                hists.append(h.astype(np.int64))
            return pa.table(
                {"pair": pa.array(ids, pa.int64()),
                 "hist": pa.array(list(hists), pa.list_(pa.int64()))}
            )

        def combine_hists(t: pa.Table) -> pa.Table:
            """Sum histograms per pair WITHIN a block — histogram addition
            is associative, so the driver should see O(partitions x pairs)
            rows, not one 32-KB row per input block x pair (O(blocks) driver
            traffic per refinement round at 100-TB block counts)."""
            ids = t.column("pair").to_numpy(zero_copy_only=False)
            flat = as_single_chunk(t.column("hist"))
            mat = np.asarray(flat.flatten(), dtype=np.int64).reshape(-1, _NBUCKETS)
            uniq = np.unique(ids)
            sums = np.zeros((len(uniq), _NBUCKETS), np.int64)
            np.add.at(sums, np.searchsorted(uniq, ids), mat)
            return pa.table(
                {"pair": pa.array(uniq), "hist": pa.array(list(sums), pa.list_(pa.int64()))}
            )

        merged: dict[tuple[str, float], np.ndarray] = {
            p: np.zeros(_NBUCKETS, np.int64) for p in active
        }
        hists = ds.map_batches(hist_batch, batch_format="pyarrow", zero_copy_batch=True)
        # tree step: coalesce the tiny per-block hist rows onto a bounded
        # number of partitions and combine there, so the final collect is
        # partition-count-sized regardless of input block count
        hists = hists.repartition(16).map_batches(
            combine_hists, batch_format="pyarrow", zero_copy_batch=True
        )
        for row in hists.take_all():
            merged[pairs[row["pair"]]] += np.asarray(row["hist"], dtype=np.int64)

        for p in active:
            s = state[p]
            h = merged[p]
            edges = np.linspace(s["lo"], s["hi"], _NBUCKETS + 1)
            cum = np.cumsum(h)
            k0 = s["r0"] - s["below"]
            k1 = s["r1"] - s["below"]
            b0 = int(np.searchsorted(cum, k0 + 1))
            b1 = int(np.searchsorted(cum, k1 + 1))
            b0 = min(b0, _NBUCKETS - 1)
            b1 = min(b1, _NBUCKETS - 1)
            new_lo, new_hi = edges[b0], edges[b1 + 1]
            s["below"] += int(cum[b0 - 1]) if b0 > 0 else 0
            s["n_range"] = int(cum[b1] - (cum[b0 - 1] if b0 > 0 else 0))
            s["lo"], s["hi"] = new_lo, new_hi
            if new_lo == new_hi or s["n_range"] <= 0:
                s["done"] = True
                s["value"] = new_lo
        for p in active:
            if state[p]["done"]:
                results[p] = state[p]["value"]

    # final exact collect of the (small) remaining candidate intervals
    active = [p for p, s in state.items() if s is not None and not s["done"]]
    if active:
        bounds = {p: (state[p]["lo"], state[p]["hi"]) for p in active}

        def collect_batch(t: pa.Table, bounds=bounds, active=tuple(active)) -> pa.Table:
            clean: dict[str, np.ndarray] = {}
            ids, vals = [], []
            for p in active:
                c, _q = p
                if c not in clean:
                    clean[c] = _clean_np(t, c)
                lo, hi = bounds[p]
                v = clean[c]
                v = v[(v >= lo) & (v <= hi)]
                ids.extend([idx_of[p]] * len(v))
                vals.append(v)
            return pa.table(
                {"pair": pa.array(ids, pa.int64()),
                 "val": pa.array(np.concatenate(vals) if vals else np.array([], np.float64))}
            )

        rows = ds.map_batches(collect_batch, batch_format="pyarrow", zero_copy_batch=True).take_all()
        by_pair: dict[tuple[str, float], list] = {p: [] for p in active}
        for r in rows:
            by_pair[pairs[r["pair"]]].append(r["val"])
        for p in active:
            s = state[p]
            v = np.sort(np.asarray(by_pair[p], dtype=np.float64))
            i0 = min(max(s["r0"] - s["below"], 0), len(v) - 1)
            i1 = min(max(s["r1"] - s["below"], 0), len(v) - 1)
            v0, v1 = float(v[i0]), float(v[i1])
            results[p] = v0 + (v1 - v0) * s["frac"]

    # interpolation for pairs finished during refinement (r0==r1 or collapsed)
    for p, s in state.items():
        if s is not None and s.get("done") and p not in results:
            results[p] = s["value"]
    return results


def distributed_quantiles(
    ds,
    cols: list[str],
    q: float = 0.5,
    collect_threshold: int = 100_000,
    max_rounds: int = 8,
) -> dict[str, float]:
    """Exact q-quantile (linear interpolation) per column of a Dataset."""
    res = _quantiles_pairs(ds, [(c, q) for c in cols], collect_threshold, max_rounds)
    return {c: res[(c, q)] for c in cols}


def distributed_quantiles_multi(
    ds,
    cols: list[str],
    qs: list[float],
    collect_threshold: int = 100_000,
    max_rounds: int = 8,
) -> dict[str, list[float]]:
    """Exact quantiles at every q in ``qs`` per column — all targets refined
    in the SAME dataset passes (cost ~ one-quantile cost, not len(qs)x)."""
    pairs = [(c, q) for c in cols for q in qs]
    res = _quantiles_pairs(ds, pairs, collect_threshold, max_rounds)
    return {c: [res[(c, q)] for q in qs] for c in cols}
