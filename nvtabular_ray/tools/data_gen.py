"""Look-alike synthetic dataset generation from a DataStats profile.

Reference: /root/reference/nvtabular/tools/data_gen.py:41-460 — ``DatasetGen``
scales test data from an inspector profile with uniform/powerlaw
distributions, categorical vocabularies and multi-hot columns.

Ray design: generation is a ``range(n) -> map_batches`` pipeline (one task
per row-shard, deterministic per (seed, shard)) so arbitrarily large
look-alike tables are produced distributed, never on the driver.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


class DatasetGen:
    """Generate a Dataset matching a DataStats profile
    ({col: {dtype, cardinality, min, max, mean, std, per_nan}}).

    Numeric columns: normal(mean, std) clipped to [min, max] (powerlaw via
    ``distro="powerlaw"``); string columns: vocabulary of ``cardinality``
    synthetic tokens, zipf-weighted; nulls injected at ``per_nan``%.
    """

    def __init__(self, profile: dict, seed: int = 42, distro: str = "normal"):
        self.profile = profile
        self.seed = seed
        self.distro = distro
        self._vocab_cache: dict[str, np.ndarray] = {}

    def _vocab(self, name: str, spec: dict) -> np.ndarray:
        """Categorical vocabulary: user values (``vocab``), a parquet file of
        values (``vocab_file``, first column — reference data_gen.py vocab
        files), or ``cardinality`` synthetic tokens."""
        if name in self._vocab_cache:
            return self._vocab_cache[name]
        if spec.get("vocab") is not None:
            v = np.asarray(spec["vocab"], dtype=object)
        elif spec.get("vocab_file"):
            import pyarrow.parquet as pq

            tab = pq.read_table(spec["vocab_file"])
            v = np.asarray(tab.column(0).to_pylist(), dtype=object)
        else:
            card = max(int(spec.get("cardinality", 10)), 1)
            v = np.array([f"{name}_{i}" for i in range(card)], dtype=object)
        self._vocab_cache[name] = v
        return v

    def _column(self, rng: np.random.Generator, name: str, spec: dict, n: int) -> pa.Array:
        dtype = spec.get("dtype", "double")
        per_nan = float(spec.get("per_nan", 0.0)) / 100.0
        null_mask = rng.random(n) < per_nan

        if dtype in ("list", "multihot") or spec.get("multi_min") is not None:
            # multi-hot column (reference data_gen.py:192-218): per-row list
            # of zipf-weighted vocabulary elements, length uniform in
            # [multi_min, multi_max]
            lo_m = max(int(spec.get("multi_min", 1)), 0)
            hi_m = max(int(spec.get("multi_max", 3)), lo_m)
            lens = rng.integers(lo_m, hi_m + 1, n)
            vocab = self._vocab(name, spec)
            weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
            weights /= weights.sum()
            lens = np.where(null_mask, 0, lens)  # null rows carry no values
            codes = rng.choice(len(vocab), size=int(lens.sum()), p=weights)
            offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            return pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(vocab[codes], pa.string()),
                # per_nan applies to list columns too — the profile's null
                # fraction must survive into the look-alike data
                mask=pa.array(null_mask) if null_mask.any() else None,
            )

        if dtype.startswith(("int", "double", "float")):
            lo = float(spec.get("min", 0.0))
            hi = float(spec.get("max", 1.0))
            mean = float(spec.get("mean", (lo + hi) / 2))
            std = float(spec.get("std", (hi - lo) / 6 or 1.0))
            if self.distro == "powerlaw":
                vals = lo + (hi - lo) * rng.power(2.0, n)
            else:
                vals = np.clip(rng.normal(mean, std or 1.0, n), lo, hi)
            if dtype.startswith("int"):
                arr = pa.array(np.round(vals).astype(np.int64), pa.int64())
                arr = pa.array(
                    np.round(vals).astype(np.int64), pa.int64(), mask=null_mask
                )
            else:
                arr = pa.array(vals, pa.float64(), mask=null_mask)
            return arr
        # string / categorical: zipf-weighted vocab (user/file/synthetic)
        vocab = self._vocab(name, spec)
        weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.2
        weights /= weights.sum()
        codes = rng.choice(len(vocab), size=n, p=weights)
        return pa.array(vocab[codes], pa.string(), mask=null_mask)

    def generate(self, num_rows: int, shard_rows: int = 100_000):
        import ray.data as rd

        n_shards = max(1, (num_rows + shard_rows - 1) // shard_rows)
        profile, seed = self.profile, self.seed
        gen_col = self._column

        def shard(batch) -> pa.Table:
            out_tables = []
            for sid in np.asarray(batch["id"]):
                rng = np.random.default_rng([seed, int(sid)])
                rows = min(shard_rows, num_rows - int(sid) * shard_rows)
                cols = {c: gen_col(rng, c, spec, rows) for c, spec in profile.items()}
                out_tables.append(pa.table(cols))
            return pa.concat_tables(out_tables)

        return rd.range(n_shards).map_batches(shard, batch_format="numpy")
