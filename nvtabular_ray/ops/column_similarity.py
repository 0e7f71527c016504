"""ColumnSimilarity: row-wise similarity between two id columns, looked up
in a feature matrix held per worker.

Reference: /root/reference/nvtabular/ops/column_similarity.py:31-283 — the
canonical stateful actor-pool stage: big CSR matrices are lazily loaded once
per worker (``_initialize_features``, :73-81) and each row computes
tfidf/cosine/inner similarity between ``features[left_id]`` and
``features[right_id]``.

Ray design: the feature matrix broadcasts via ray.put (BroadcastTableState)
and resolves once per actor; the per-batch kernel is a vectorized gather +
row-wise dot. Selector shape: ``[["left_id", "right_id"]] >>
ColumnSimilarity(features)``; output column "{left}_{right}_sim".
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import list_to_numpy_2d
from nvtabular_ray.ops.base import BroadcastTableState, Operator


class ColumnSimilarity(BroadcastTableState, Operator):
    def __init__(self, features, metric: str = "cosine", on_device: bool = False):
        """features: 2D numpy array (row i = feature vector of id i) or a
        pa.Table with an ``embedding`` list column indexed by position."""
        if metric not in ("cosine", "inner", "tfidf"):
            raise ValueError("metric must be cosine, inner or tfidf")
        self.metric = metric
        if isinstance(features, pa.Table):
            mat = list_to_numpy_2d(features.column(features.column_names[-1]))
        else:
            mat = np.asarray(features, dtype=np.float64)
        # store as an arrow table for broadcast plumbing
        self.state_tables = {
            "features": pa.table({"row": pa.array(np.arange(len(mat))), "vec": pa.array(list(mat))})
        }
        self._mat: Optional[np.ndarray] = None

    def _matrix(self) -> np.ndarray:
        if getattr(self, "_mat", None) is None:
            tab = self.state_tables["features"]
            self._mat = list_to_numpy_2d(tab.column("vec"))
            if self.metric == "tfidf":
                # reference column_similarity.py:274-277: idf = log(N / df_j)
                # over NONZERO entries, weight, then row-normalize (:263-264)
                nz = self._mat != 0
                df = nz.sum(axis=0).astype(np.float64)
                df[df == 0] = 1.0
                self._mat = self._mat * np.log(len(self._mat) / df)[None, :]
            if self.metric in ("cosine", "tfidf"):
                norms = np.linalg.norm(self._mat, axis=1, keepdims=True)
                norms[norms == 0] = 1.0
                self._mat = self._mat / norms
        return self._mat

    def _pairs(self, col_selector) -> list[tuple[str, str]]:
        out = []
        for g in col_selector.grouped_names:
            if isinstance(g, tuple) and len(g) == 2:
                out.append((g[0], g[1]))
            else:
                raise ValueError("ColumnSimilarity needs 2-column groups [['a','b']]")
        return out

    def column_mapping(self, col_selector):
        return {f"{a}_{b}_sim": [a, b] for a, b in self._pairs(col_selector)}

    def output_dtype(self):
        return pa.float64()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        mat = self._matrix()
        out = {}
        for a, b in self._pairs(col_selector):
            ia = table.column(a).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            ib = table.column(b).combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            va, vb = mat[ia], mat[ib]
            sim = np.einsum("ij,ij->i", va, vb)
            out[f"{a}_{b}_sim"] = pa.array(sim)
        return pa.table(out)
