"""Embedding pooling & normalization.

Vector-column counterparts of the scalar stat ops: L2-normalize a
``list<float>`` column (the pre-step every cosine ANN/similarity stage
wants) and mean-pool vectors per group (a conversation/user/cluster
embedding from its member vectors). The reference engine has no vector
kernels at all (ColumnSimilarity consumes PRE-built sparse matrices,
/root/reference/nvtabular/ops/column_similarity.py:30-60) — new scope
under the LLM-pipeline extension mandate (SURVEY §2.4).

Scale design:

- ``l2_normalize`` is one streaming ``map_batches``: zero-copy
  flatten+reshape (``list_to_numpy_2d``), one fused numpy norm per batch,
  ListArray reassembly. No shuffle, no state.
- ``mean_pool`` is the textbook combiner pattern: each batch reduces its
  rows to (group, dim, partial_sum, partial_count) — group-cardinality ×
  dim rows, NOT row-count — via one stable argsort + ``np.add.reduceat``;
  one task-based hash exchange merges partials (``bucketed_aggregate``,
  the same machinery every stat fit uses) and the mean divides inside the
  bucket. Works for group keys of any cardinality: nothing group-sized
  ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, list_to_numpy_2d


def l2_normalize(ds, vec_col: str = "embedding", out_col: str | None = None):
    """Row-wise L2 normalization of a fixed-width ``list<float>`` column
    (float64 output). Zero vectors pass through unchanged (no NaN/inf);
    null rows stay null."""
    out_name = out_col or vec_col

    def f(t: pa.Table) -> pa.Table:
        col = as_single_chunk(t.column(vec_col))
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        if not valid.all():
            dense = col.filter(pa.array(valid))
        else:
            dense = col
        mat = list_to_numpy_2d(dense, np.float64)
        if not mat.flags.writeable:
            # zero-copy views over plasma-backed blocks are READ-ONLY (the
            # driver-row parquet path happened to copy; from_arrow/union
            # inputs do not) — the in-place divide needs ownership
            mat = mat.copy()
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        np.divide(mat, norms[:, None], out=mat, where=norms[:, None] > 0)
        d = mat.shape[1] if mat.size else 0
        offsets = np.arange(len(mat) + 1, dtype=np.int32) * d
        arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(mat.ravel()))
        if not valid.all():
            # re-inject null rows: gather dense rows back to input positions
            idx = np.cumsum(valid) - 1
            arr = arr.take(pa.array(np.where(valid, idx, 0), mask=~valid))
        cols = {c: t.column(c) for c in t.column_names}
        cols[out_name] = arr
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def mean_pool(
    ds,
    group_col: str,
    vec_col: str = "embedding",
    num_buckets=None,
):
    """Element-wise mean of ``vec_col`` per ``group_col`` value, exploded as
    (group, dim, mean) rows — dim is 1-based (SQL ``generate_subscripts``
    parity). Null-vector rows are excluded (SQL ``avg`` null-skip parity);
    null GROUP values form their own group, as in SQL ``GROUP BY``."""
    from nvtabular_ray.functions.aggregates import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        g_type = t.schema.field(group_col).type
        empty = pa.table(
            {group_col: pa.array([], g_type), "dim": pa.array([], pa.int64()),
             "psum": pa.array([], pa.float64()), "pcnt": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        vec = as_single_chunk(t.column(vec_col))
        keep = pc.is_valid(vec).to_numpy(zero_copy_only=False)
        if not keep.all():
            t = t.filter(pa.array(keep))
            vec = as_single_chunk(t.column(vec_col))
        if t.num_rows == 0:
            return empty
        mat = list_to_numpy_2d(vec, np.float64)
        g = as_single_chunk(t.column(group_col))
        enc = g.dictionary_encode()
        codes = pc.fill_null(enc.indices, -1).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
        sums = np.add.reduceat(mat[order], starts, axis=0)
        cnts = np.diff(np.r_[starts, len(sc)])
        d = mat.shape[1]
        n_g = len(starts)
        # host quirk: array-count np.repeat is fast on float64 only
        gidx = np.repeat(np.arange(n_g, dtype=np.float64), d).astype(np.int64)
        keys = g.take(pa.array(order[starts])).take(pa.array(gidx))
        return pa.table(
            {
                group_col: keys,
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), n_g)),
                "psum": pa.array(sums.ravel(), pa.float64()),
                "pcnt": pa.array(np.repeat(cnts.astype(np.float64), d).astype(np.int64)),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = bucketed_aggregate(
        partials, [group_col, "dim"], {"psum": "sum", "pcnt": "sum"},
        num_buckets=num_buckets, names="keep",
    )

    def finish(t: pa.Table) -> pa.Table:
        mean = t.column("psum").to_numpy(zero_copy_only=False) / t.column("pcnt").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {group_col: t.column(group_col), "dim": t.column("dim"),
             "mean_val": pa.array(mean, pa.float64())}
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
