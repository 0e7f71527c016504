"""List (multi-hot) column ops: ListSlice, ValueCount.

ListSlice reference: /root/reference/nvtabular/ops/list_slice.py:29-228 —
python-slice semantics per row (negative indices ok), optional padding to a
fixed length. The reference uses numba.cuda kernels on GPU and a Python
per-row loop on CPU; here the offsets math is vectorized numpy + one
pc.take — no per-row Python.

ValueCount reference: /root/reference/nvtabular/ops/value_counts.py:26-78 —
records min/max list length into schema properties; data passes through.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type
from nvtabular_ray.ops.base import Operator, StatOperator


class ListSlice(Operator):
    def __init__(self, start: int, end: int = None, pad: bool = False, pad_value: float = 0.0):
        self.start = start
        self.end = end
        self.pad = pad
        self.pad_value = pad_value
        # reference arg normalization (list_slice.py:64-74)
        if self.start > 0 and self.end is None:
            self.end = self.start
            self.start = 0
        if self.end is None:
            self.end = np.iinfo(np.int64).max
        if self.start < 0:
            self.max_elements = -(self.start if self.end > 0 else self.start - self.end)
        else:
            self.max_elements = self.end - self.start

    def _slice_array(self, arr: pa.Array) -> pa.Array:
        arr = as_single_chunk(arr)
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(arr)
        row_start, row_len = offsets[:-1], np.diff(offsets)
        # python slice semantics, vectorized
        s = np.where(
            self.start >= 0,
            np.minimum(self.start, row_len),
            np.maximum(row_len + self.start, 0),
        )
        e = np.where(
            self.end >= 0,
            np.minimum(self.end, row_len),
            np.maximum(row_len + self.end, 0),
        )
        e = np.maximum(e, s)
        out_len = e - s
        total = int(out_len.sum())
        # gather indices: for row i, row_start[i]+s[i] .. row_start[i]+e[i]
        heads = np.repeat(row_start + s, out_len)
        cum = np.concatenate([[0], np.cumsum(out_len)])
        gather = heads + (np.arange(total) - np.repeat(cum[:-1], out_len))
        values = pc.take(arr.values, pa.array(gather, pa.int64()))
        if not self.pad:
            if pa.types.is_large_list(arr.type):
                return pa.LargeListArray.from_arrays(pa.array(cum, pa.int64()), values)
            return pa.ListArray.from_arrays(pa.array(cum.astype(np.int32), pa.int32()), values)
        # pad every row to max_elements
        m = int(self.max_elements)
        vals_np = values.to_numpy(zero_copy_only=False)
        out = np.full((n, m), self.pad_value, dtype=np.asarray(vals_np).dtype if len(vals_np) else np.float64)
        row_idx = np.repeat(np.arange(n), out_len)
        col_idx = np.arange(total) - np.repeat(cum[:-1], out_len)
        keep = col_idx < m
        out[row_idx[keep], col_idx[keep]] = np.asarray(vals_np)[keep]
        flat = pa.array(out.reshape(-1)).cast(arr.type.value_type)
        # preserve the input list flavor so the output schema is stable
        if pa.types.is_large_list(arr.type):
            return pa.LargeListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * m), flat
            )
        return pa.ListArray.from_arrays(
            pa.array((np.arange(n + 1, dtype=np.int64) * m).astype(np.int32), pa.int32()), flat
        )

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            arr = table.column(name)
            if not is_list_type(as_single_chunk(arr).type):
                raise TypeError(f"ListSlice applied to non-list column {name}")
            cols[name] = self._slice_array(arr)
        return pa.table(cols)


class ValueCount(StatOperator):
    """Fit: distributed min/max list length per column (diff of offsets per
    batch, tiny combine). Transform: identity; lengths land in the workflow's
    output properties (value_count min/max)."""

    def __init__(self):
        super().__init__()
        self.stats: dict[str, dict] = {}

    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        cols = list(col_selector.names)

        def partial(t: pa.Table) -> pa.Table:
            names, mins, maxs = [], [], []
            for c in cols:
                arr = as_single_chunk(t.column(c))
                if not is_list_type(arr.type):
                    continue
                lens = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
                if len(lens):
                    names.append(c)
                    mins.append(int(lens.min()))
                    maxs.append(int(lens.max()))
            return pa.table(
                {
                    "col": pa.array(names, pa.string()),
                    "min": pa.array(mins, pa.int64()),
                    "max": pa.array(maxs, pa.int64()),
                }
            )

        merged = grouped_reduce(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["col"],
            {"min": "min", "max": "max"},
        )
        for row in merged.to_dict("records"):
            self.stats[row["col"]] = {
                "value_count": {"min": int(row["min"]), "max": int(row["max"])}
            }

    def clear(self):
        super().clear()
        self.stats = {}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        return table.select(col_selector.names)

    def output_properties(self) -> dict:
        return self.stats
