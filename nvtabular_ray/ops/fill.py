"""FillMedian stat op (FillMissing lives in ops/simple.py).

Reference: /root/reference/nvtabular/ops/fill.py:83-146 — fills nulls with a
fitted per-column median. The reference uses Dask's *approximate* quantile;
we compute the EXACT interpolated median with the streaming histogram-refine
engine (functions/quantile.py), so results match a DuckDB/pandas oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import numpy as np

from nvtabular_ray.arrow_utils import as_single_chunk
from nvtabular_ray.functions.quantile import (
    distributed_quantiles,
    distributed_quantiles_multi,
)
from nvtabular_ray.ops.base import StatOperator


class FillMedian(StatOperator):
    def __init__(self, add_binary_cols: bool = False):
        super().__init__()
        self.add_binary_cols = add_binary_cols
        self.medians: dict[str, float] = {}

    def fit(self, col_selector, ds) -> None:
        self.medians = distributed_quantiles(ds, col_selector.names, q=0.5)

    def clear(self):
        super().clear()
        self.medians = {}

    def column_mapping(self, col_selector):
        mapping = {name: [name] for name in col_selector.names}
        if self.add_binary_cols:
            for name in col_selector.names:
                mapping[f"{name}_filled"] = [name]
        return mapping

    def compute_output_schema(self, col_selector, input_schema):
        out = {}
        for n in col_selector.names:
            t = input_schema.get(n)
            out[n] = t if (t is not None and pa.types.is_floating(t)) else pa.float64()
        return out

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            arr = table.column(name)
            med = self.medians[name]
            if self.add_binary_cols:
                cols[f"{name}_filled"] = pc.is_null(arr, nan_is_null=True)
            fill = pa.scalar(med, type=pa.float64())
            out = pc.cast(arr, pa.float64())
            out = pc.if_else(pc.is_nan(pc.fill_null(out, fill)), fill, pc.fill_null(out, fill))
            cols[name] = pc.cast(out, arr.type) if pa.types.is_floating(arr.type) else out
        ordered = {}
        for name in col_selector.names:
            ordered[name] = cols[name]
            if self.add_binary_cols:
                ordered[f"{name}_filled"] = cols[f"{name}_filled"]
        return pa.table(ordered)


class QuantileBucketize(StatOperator):
    """Equal-frequency discretizer: fit EXACT interpolated quantile cut
    points at q = 1/k .. (k-1)/k (one shared streaming histogram-refine
    pass for all cut points, functions/quantile.py), then bin with
    ``np.digitize(right=False)`` — value == boundary goes to the higher
    bin, matching a ``value >= cut`` SQL CASE. Output int32 in [0, k-1];
    nulls/NaN stay null. The reference's Bucketize takes explicit
    boundaries only (/root/reference/nvtabular/ops/bucketize.py:24-104);
    fitted quantile binning is new scope."""

    def __init__(self, num_buckets: int = 4):
        super().__init__()
        if num_buckets < 2:
            raise ValueError("num_buckets must be >= 2")
        self.num_buckets = int(num_buckets)
        self.boundaries: dict[str, list[float]] = {}

    def fit(self, col_selector, ds) -> None:
        qs = [i / self.num_buckets for i in range(1, self.num_buckets)]
        self.boundaries = distributed_quantiles_multi(ds, col_selector.names, qs)

    def clear(self):
        super().clear()
        self.boundaries = {}

    def output_dtype(self):
        return pa.int32()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            arr = as_single_chunk(table.column(name))
            null_mask = pc.is_null(arr, nan_is_null=True).to_numpy(zero_copy_only=False)
            vals = pc.cast(arr, pa.float64()).to_numpy(zero_copy_only=False)
            # all-null fit yields None cut points — no boundaries, bin 0
            bounds = [b for b in self.boundaries[name] if b is not None]
            binned = np.digitize(vals, np.asarray(bounds, dtype=np.float64), right=False)
            cols[name] = pa.array(binned.astype(np.int32), mask=null_mask)
        return pa.table(cols)
