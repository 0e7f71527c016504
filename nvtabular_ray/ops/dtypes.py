"""ReduceDtypeSize: downcast columns to the smallest dtype that fits.

Reference: /root/reference/nvtabular/ops/reduce_dtype_size.py:27-86 — fit
min/max per column; ints -> smallest int dtype whose range covers [min,max],
floats -> float32.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import dataset_arrow_schema
import pyarrow.compute as pc

from nvtabular_ray.ops.base import StatOperator
from nvtabular_ray.ops.moments import column_moments

_INT_RANGES = [
    (pa.int8(), np.iinfo(np.int8)),
    (pa.int16(), np.iinfo(np.int16)),
    (pa.int32(), np.iinfo(np.int32)),
    (pa.int64(), np.iinfo(np.int64)),
]


class ReduceDtypeSize(StatOperator):
    def compute_output_schema(self, col_selector, input_schema):
        # target dtype depends on the VALUES (fitted min/max): unknown here
        return {n: None for n in col_selector.names}

    def __init__(self, float_dtype="float32"):
        super().__init__()
        self.ranges: dict[str, tuple] = {}
        self.target_types: dict[str, pa.DataType] = {}
        self.float_dtype = float_dtype

    def fit(self, col_selector, ds) -> None:
        schema = dataset_arrow_schema(ds)
        types = dict(zip(schema.names, schema.types))
        numeric = [
            c
            for c in col_selector.names
            if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
        ]
        stats = column_moments(ds, numeric) if numeric else {}
        for col in col_selector.names:
            t = types[col]
            if pa.types.is_integer(t):
                lo, hi = stats[col]["min"], stats[col]["max"]
                self.ranges[col] = (lo, hi)
                for target, info in _INT_RANGES:
                    if lo >= info.min and hi <= info.max:
                        self.target_types[col] = target
                        break
            elif pa.types.is_floating(t):
                self.target_types[col] = pa.from_numpy_dtype(np.dtype(self.float_dtype))
            else:
                self.target_types[col] = t

    def clear(self):
        super().clear()
        self.ranges, self.target_types = {}, {}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            target = self.target_types.get(name)
            arr = table.column(name)
            cols[name] = pc.cast(arr, target) if target is not None else arr
        return pa.table(cols)
