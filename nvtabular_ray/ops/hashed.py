"""Hash-based categorical ops: HashBucket, HashedCross.

One documented stable hash everywhere (functions/hashing.py), replacing the
reference's divergent CPU/GPU hashes (categorify.py:332-338).
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type, map_list_values
from nvtabular_ray.functions.hashing import hash64
from nvtabular_ray.ops.base import Operator


class HashBucket(Operator):
    """hash(col) % num_buckets per column; list columns hash their elements.
    Out int32. Reference: /root/reference/nvtabular/ops/hash_bucket.py:32-131.
    """

    def __init__(self, num_buckets: Union[int, Dict[str, int]]):
        if isinstance(num_buckets, dict):
            self.num_buckets = num_buckets
        elif isinstance(num_buckets, int):
            self.num_buckets = num_buckets
        else:
            raise TypeError("num_buckets must be int or dict")

    def _buckets(self, col: str) -> int:
        if isinstance(self.num_buckets, dict):
            return self.num_buckets[col]
        return self.num_buckets

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for name in col_selector.names:
            nb = self._buckets(name)

            def kernel(values: pa.Array, nb=nb) -> pa.Array:
                h = hash64(values) % np.uint64(nb)
                return pa.array(h.astype(np.int32), type=pa.int32())

            arr = as_single_chunk(table.column(name))
            if is_list_type(arr.type):
                cols[name] = map_list_values(arr, kernel)
            else:
                cols[name] = kernel(arr)
        return pa.table(cols)


class HashedCross(Operator):
    """Cross features: XOR of per-column hashes, mod num_buckets; output
    column named "a_X_b". Out int32.
    Reference: /root/reference/nvtabular/ops/hashed_cross.py:24-91.
    """

    def __init__(self, num_buckets: Union[int, Dict[tuple, int]]):
        self.num_buckets = num_buckets

    def _crosses(self, col_selector) -> list[tuple]:
        grouped = col_selector.grouped_names
        if all(isinstance(g, str) for g in grouped):
            return [tuple(grouped)]
        return [g if isinstance(g, tuple) else (g,) for g in grouped]

    def column_mapping(self, col_selector):
        return {"_X_".join(cross): list(cross) for cross in self._crosses(col_selector)}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        for cross in self._crosses(col_selector):
            val = np.zeros(table.num_rows, dtype=np.uint64)
            for column in cross:
                val = hash64(table.column(column)) ^ val
            nb = (
                self.num_buckets[cross]
                if isinstance(self.num_buckets, dict)
                else self.num_buckets
            )
            val = val % np.uint64(nb)
            cols["_X_".join(cross)] = pa.array(val.astype(np.int32), type=pa.int32())
        return pa.table(cols)
