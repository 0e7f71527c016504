"""Distributed column statistics: the partial/combine moments engine.

Reference: /root/reference/nvtabular/ops/moments.py:28-116 — per-partition
(count, sum, squaredsum) partials tree-reduced, then mean/std finalized with
ddof=1. Ray version: one ``map_batches`` pass emits one partial row per
column per batch; a tiny ``groupby("col").aggregate(Sum, Min, Max)`` merges
them (Ray's map-side combine keeps the shuffle negligible); the driver
finalizes scalars. One data pass for any number of columns.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type


def _clean_values(arr: pa.Array) -> pa.Array:
    """Flatten list columns; treat NaN as null (pandas-skipna semantics)."""
    arr = as_single_chunk(arr)
    if is_list_type(arr.type):
        arr = arr.flatten()
    if pa.types.is_floating(arr.type):
        arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
    return arr


def _partials_batch(table: pa.Table, cols: list[str]) -> pa.Table:
    names, counts, sums, sumsqs, mins, maxs = [], [], [], [], [], []
    for name in cols:
        arr = _clean_values(table.column(name))
        valid = len(arr) - arr.null_count
        farr = pc.cast(arr, pa.float64())
        s = pc.sum(farr).as_py() or 0.0
        sq = pc.sum(pc.multiply(farr, farr)).as_py() or 0.0
        mn = pc.min(farr).as_py()
        mx = pc.max(farr).as_py()
        names.append(name)
        counts.append(valid)
        sums.append(s)
        sumsqs.append(sq)
        mins.append(mn if mn is not None else math.inf)
        maxs.append(mx if mx is not None else -math.inf)
    return pa.table(
        {
            "col": pa.array(names, pa.string()),
            "count": pa.array(counts, pa.int64()),
            "sum": pa.array(sums, pa.float64()),
            "sumsq": pa.array(sumsqs, pa.float64()),
            "min": pa.array(mins, pa.float64()),
            "max": pa.array(maxs, pa.float64()),
        }
    )


MOMENTS_KEYS = ["col"]
MOMENTS_SPEC = {"count": "sum", "sum": "sum", "sumsq": "sum", "min": "min", "max": "max"}


def column_moments(ds, cols: list[str]) -> dict[str, dict[str, float]]:
    """Returns {col: {count, mean, std(ddof=1), var, min, max, sum}}.

    Finalization math mirrors /root/reference/nvtabular/ops/moments.py:89-116.
    """
    from nvtabular_ray.functions.aggregates import grouped_reduce

    partials = ds.map_batches(
        lambda t: _partials_batch(t, cols), batch_format="pyarrow", zero_copy_batch=True
    )
    merged = grouped_reduce(partials, MOMENTS_KEYS, MOMENTS_SPEC)
    return finalize_moments(merged)


def finalize_moments(merged_df) -> dict[str, dict[str, float]]:
    out: dict[str, dict[str, float]] = {}
    for row in merged_df.to_dict("records"):
        n = int(row["count"])
        s = float(row["sum"])
        sq = float(row["sumsq"])
        mean = s / n if n else float("nan")
        # ddof=1 (reference moments.py:104: div = count - 1); n <= ddof has
        # UNDEFINED variance — the reference yields NaN there, and 0.0 would
        # make Normalize silently center-only a column with one observation
        var = (sq - n * mean * mean) / (n - 1) if n > 1 else float("nan")
        var = max(var, 0.0) if not math.isnan(var) else var
        out[row["col"]] = {
            "count": n,
            "sum": s,
            "mean": mean,
            "var": var,
            "std": math.sqrt(var) if not math.isnan(var) else var,
            # all-null columns must not leak the min/max identity elements
            "min": float(row["min"]) if n else float("nan"),
            "max": float(row["max"]) if n else float("nan"),
        }
    return out
