"""DataStats: per-column profiling (dtype class, cardinality, min/max,
mean/std, %NaN) — feeds dataset inspection / synthetic-data generation.

Reference: /root/reference/nvtabular/ops/data_stats.py:25-121 (dispatches on
dtype; strings profile min/max/mean of str.len; cardinality is exact
nunique). Ray design: one map_batches pass emits per-batch partials; exact
distinct counts travel as 64-bit value hashes (columns never ship their
payloads), combined with the streaming grouped_reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import dataset_arrow_schema, as_single_chunk, is_list_type
from nvtabular_ray.functions.hashing import hash64
from nvtabular_ray.ops.base import StatOperator


class DataStats(StatOperator):
    def __init__(self, approx_distinct: bool = False,
                 distinct_memory_limit: int = 1 << 30):
        super().__init__()
        # approx_distinct=True swaps exact hash-distinct for a HyperLogLog
        # sketch (functions/hll.py): reduced state drops from O(distinct)
        # to 2^14 registers per column — the right mode when an id-like
        # column has 10^9 cardinality on a 100-TB run (~0.8% std error)
        self.approx_distinct = approx_distinct
        # the EXACT distinct path reduces to one driver row per distinct
        # value; this cap turns a silent driver OOM on an id-like column
        # into an actionable error pointing at approx_distinct=True
        self.distinct_memory_limit = distinct_memory_limit
        self.output: dict[str, dict] = {}

    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce
        from nvtabular_ray.ops.moments import column_moments

        schema = dataset_arrow_schema(ds)
        types = dict(zip(schema.names, schema.types))
        cols = list(col_selector.names)

        num_cols = [c for c in cols if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])]
        str_cols = [c for c in cols if pa.types.is_string(types[c]) or pa.types.is_large_string(types[c])]

        # distinct counts via hashed values (exact; payloads never shuffle)
        def distinct_partial(t: pa.Table) -> pa.Table:
            names, hashes, nulls, counts = [], [], [], []
            for c in cols:
                arr = as_single_chunk(t.column(c))
                if is_list_type(arr.type):
                    arr = arr.flatten()
                nn = arr.null_count
                uniq = pc.unique(arr.drop_null())
                h = hash64(uniq).astype(np.int64)
                if len(h) == 0 and (nn or len(arr)):
                    # all-null/empty batch: a sentinel row carries the
                    # null/row counts (dedup key 0 merges harmlessly — the
                    # final nunique counts only distinct h of non-null rows,
                    # and cardinality for an all-null column is 0 anyway...
                    # except the sentinel adds 1; subtract via null marker)
                    names.append(pa.array([c], pa.string()))
                    hashes.append(pa.array([None], pa.int64()))
                    nulls.append(pa.array([nn], pa.int64()))
                    counts.append(pa.array([len(arr)], pa.int64()))
                    continue
                names.append(pa.array([c] * len(h), pa.string()))
                hashes.append(pa.array(h))
                nulls.append(pa.array(([nn] + [0] * (len(h) - 1)) if len(h) else [], pa.int64()))
                counts.append(pa.array([len(arr)] + [0] * (len(h) - 1) if len(h) else [], pa.int64()))
            return pa.table(
                {
                    "col": pa.concat_arrays(names),
                    "h": pa.concat_arrays(hashes),
                    "nulls": pa.concat_arrays(nulls),
                    "rows": pa.concat_arrays(counts),
                }
            )

        def hll_partial_tbl(t: pa.Table) -> pa.Table:
            from nvtabular_ray.functions.hll import hll_partial

            names, idxs, rhos, nulls, counts = [], [], [], [], []
            for c in cols:
                arr = as_single_chunk(t.column(c))
                if is_list_type(arr.type):
                    arr = arr.flatten()
                nn = arr.null_count
                idx, rho = hll_partial(hash64(arr.drop_null()))
                if len(idx) == 0 and (nn or len(arr)):
                    # all-null / empty batch: a sentinel row (register -1,
                    # rho 0 — hll_estimate ignores it) carries the null and
                    # row counts instead of silently dropping them
                    idx = np.array([-1], dtype=np.int64)
                    rho = np.array([0], dtype=np.int64)
                k = len(idx)
                names.append(pa.array([c] * k, pa.string()))
                idxs.append(pa.array(idx))
                rhos.append(pa.array(rho))
                nulls.append(pa.array(([nn] + [0] * (k - 1)) if k else [], pa.int64()))
                counts.append(pa.array(([len(arr)] + [0] * (k - 1)) if k else [], pa.int64()))
            return pa.table(
                {
                    "col": pa.concat_arrays(names),
                    "h": pa.concat_arrays(idxs),
                    "rho": pa.concat_arrays(rhos),
                    "nulls": pa.concat_arrays(nulls),
                    "rows": pa.concat_arrays(counts),
                }
            )

        if self.approx_distinct:
            from nvtabular_ray.functions.hll import hll_estimate

            parts = ds.map_batches(hll_partial_tbl, batch_format="pyarrow", zero_copy_batch=True)
            merged = grouped_reduce(
                parts, ["col", "h"], {"rho": "max", "nulls": "sum", "rows": "sum"}
            )
            rows = {
                c: {
                    "cardinality": int(round(hll_estimate(g["h"].to_numpy(), g["rho"].to_numpy()))),
                    "nulls": int(g["nulls"].sum()),
                    "rows": int(g["rows"].sum()),
                }
                for c, g in merged.groupby("col")
            }
            per_col = pd.DataFrame.from_dict(rows, orient="index")
        else:
            parts = ds.map_batches(distinct_partial, batch_format="pyarrow", zero_copy_batch=True)
            try:
                merged = grouped_reduce(
                    parts, ["col", "h"], {"nulls": "sum", "rows": "sum"},
                    memory_limit=self.distinct_memory_limit,
                )
            except MemoryError as e:
                raise MemoryError(
                    f"{e} — use DataStats(approx_distinct=True) for "
                    "high-cardinality columns (HyperLogLog, fixed state)"
                ) from None
            per_col = merged.groupby("col").agg(
                cardinality=("h", "nunique"), nulls=("nulls", "sum"), rows=("rows", "sum")
            )

        moments = column_moments(ds, num_cols) if num_cols else {}

        # string length stats in one extra lightweight pass
        strlen_stats = {}
        if str_cols:

            def strlen_partial(t: pa.Table) -> pa.Table:
                # emit a row ONLY for columns with data in this batch:
                # ``pc.min(empty).as_py() or 0`` coerced an all-null batch
                # into min=0, dragging the profiled minimum to 0 for every
                # column that has even one fully-null block
                names, mins, maxs, sums, ns = [], [], [], [], []
                for c in str_cols:
                    ln = pc.utf8_length(as_single_chunk(t.column(c)).drop_null())
                    if len(ln) == 0:
                        continue
                    names.append(c)
                    mins.append(pc.min(ln).as_py())
                    maxs.append(pc.max(ln).as_py())
                    sums.append(pc.sum(ln).as_py())
                    ns.append(len(ln))
                return pa.table(
                    {
                        "col": pa.array(names, pa.string()),
                        "min": pa.array(mins, pa.int64()),
                        "max": pa.array(maxs, pa.int64()),
                        "sum": pa.array(sums, pa.int64()),
                        "n": pa.array(ns, pa.int64()),
                    }
                )

            sl = grouped_reduce(
                ds.map_batches(strlen_partial, batch_format="pyarrow", zero_copy_batch=True),
                ["col"],
                {"min": "min", "max": "max", "sum": "sum", "n": "sum"},
            )
            for row in sl.to_dict("records"):
                strlen_stats[row["col"]] = row

        for c in cols:
            t = types[c]
            info = per_col.loc[c] if c in per_col.index else None
            rows = int(info["rows"]) if info is not None else 0
            entry: dict = {
                "dtype": str(t),
                "cardinality": int(info["cardinality"]) if info is not None else 0,
                "per_nan": (float(info["nulls"]) / rows * 100.0) if info is not None and rows else 0.0,
            }
            if c in moments:
                entry.update(
                    {
                        "min": moments[c]["min"],
                        "max": moments[c]["max"],
                        "mean": moments[c]["mean"],
                        "std": moments[c]["std"],
                    }
                )
            if c in strlen_stats:
                s = strlen_stats[c]
                entry.update(
                    {
                        "min": int(s["min"]),
                        "max": int(s["max"]),
                        "mean": float(s["sum"]) / max(int(s["n"]), 1),
                    }
                )
            self.output[c] = entry

    def clear(self):
        super().clear()
        self.output = {}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        return table.select(col_selector.names)
