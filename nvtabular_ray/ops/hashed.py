"""Hash-based categorical ops: HashBucket, HashedCross.

Two documented stable hashes (functions/hashing.py), replacing the
reference's divergent CPU/GPU hashes (categorify.py:332-338):

- ``spec="md5"`` (default): PUBLIC 60-bit md5-prefix hash, exactly
  replicable in any SQL engine (DuckDB oracle:
  ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))::BIGINT % nb``).
  Cost ~1µs per DISTINCT value per batch (dictionary-encoded).
- ``spec="siphash"``: pandas SipHash-1-3, ~10x faster on high-cardinality
  columns, not replicable outside this engine.
"""

from __future__ import annotations

from typing import Dict, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type, map_list_values
from nvtabular_ray.functions.hashing import hash64, md5_60
from nvtabular_ray.ops.base import Operator


def _hash_fn(spec: str):
    if spec == "md5":
        return md5_60
    if spec == "siphash":
        return hash64
    raise ValueError("spec must be 'md5' or 'siphash'")


class HashBucket(Operator):
    """hash(col) % num_buckets per column; list columns hash their elements.
    Out int32. Reference: /root/reference/nvtabular/ops/hash_bucket.py:32-131.
    """

    def __init__(self, num_buckets: Union[int, Dict[str, int]], spec: str = "md5"):
        if isinstance(num_buckets, dict):
            self.num_buckets = num_buckets
        elif isinstance(num_buckets, int):
            self.num_buckets = num_buckets
        else:
            raise TypeError("num_buckets must be int or dict")
        self.spec = spec
        _hash_fn(spec)

    def _buckets(self, col: str) -> int:
        if isinstance(self.num_buckets, dict):
            return self.num_buckets[col]
        return self.num_buckets

    def compute_output_schema(self, col_selector, input_schema):
        out = {}
        for n in col_selector.names:
            t = input_schema.get(n)
            if t is not None and pa.types.is_list(t):
                out[n] = pa.list_(pa.int32())
            elif t is not None and pa.types.is_large_list(t):
                out[n] = pa.large_list(pa.int32())
            else:
                out[n] = pa.int32()
        return out

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        hf = _hash_fn(self.spec)
        for name in col_selector.names:
            nb = self._buckets(name)

            def kernel(values: pa.Array, nb=nb) -> pa.Array:
                h = hf(values) % np.uint64(nb)
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

    def __init__(self, num_buckets: Union[int, Dict[tuple, int]], spec: str = "md5"):
        self.num_buckets = num_buckets
        self.spec = spec
        _hash_fn(spec)

    def _crosses(self, col_selector) -> list[tuple]:
        grouped = col_selector.grouped_names
        if all(isinstance(g, str) for g in grouped):
            return [tuple(grouped)]
        return [g if isinstance(g, tuple) else (g,) for g in grouped]

    def column_mapping(self, col_selector):
        return {"_X_".join(cross): list(cross) for cross in self._crosses(col_selector)}

    def output_dtype(self):
        return pa.int32()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        cols = {}
        hf = _hash_fn(self.spec)
        for cross in self._crosses(col_selector):
            val = np.zeros(table.num_rows, dtype=np.uint64)
            for column in cross:
                val = hf(table.column(column)) ^ val
            nb = (
                self.num_buckets[cross]
                if isinstance(self.num_buckets, dict)
                else self.num_buckets
            )
            val = val % np.uint64(nb)
            cols["_X_".join(cross)] = pa.array(val.astype(np.int32), type=pa.int32())
        return pa.table(cols)
