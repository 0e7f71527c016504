"""DropLowCardinality: drop categorical columns whose distinct-value count
is below a minimum.

Reference: /root/reference/nvtabular/ops/drop_low_cardinality.py:21-89 (pure
schema logic there — cardinality comes from Categorify's schema properties).
Here it is a stat op that measures cardinality itself (hashed-distinct
partials, exact), so it also works standalone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type
from nvtabular_ray.functions.hashing import hash64
from nvtabular_ray.ops.base import StatOperator


class DropLowCardinality(StatOperator):
    def __init__(self, min_cardinality: int = 2):
        super().__init__()
        self.min_cardinality = min_cardinality
        self.cardinalities: dict[str, int] = {}

    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        cols = list(col_selector.names)

        def partial(t: pa.Table) -> pa.Table:
            names, hashes = [], []
            for c in cols:
                arr = as_single_chunk(t.column(c))
                if is_list_type(arr.type):
                    arr = arr.flatten()
                uniq = pc.unique(arr.drop_null())
                h = hash64(uniq).astype(np.int64)
                names.append(pa.array([c] * len(h), pa.string()))
                hashes.append(pa.array(h))
            return pa.table(
                {"col": pa.concat_arrays(names), "h": pa.concat_arrays(hashes),
                 "one": pa.array(np.ones(sum(len(x) for x in hashes), np.int64))}
            )

        merged = grouped_reduce(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            ["col", "h"],
            {"one": "min"},
        )
        self.cardinalities = merged.groupby("col")["h"].nunique().to_dict()

    def clear(self):
        super().clear()
        self.cardinalities = {}

    def _kept(self, col_selector) -> list[str]:
        if not self.fitted and not self.cardinalities:
            return list(col_selector.names)
        return [
            c
            for c in col_selector.names
            if self.cardinalities.get(c, self.min_cardinality) >= self.min_cardinality
        ]

    def column_mapping(self, col_selector):
        return {c: [c] for c in self._kept(col_selector)}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        return table.select(self._kept(col_selector))
