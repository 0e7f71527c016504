"""kNN join: broadcast-exact and IVF-partitioned variants vs a numpy
brute-force reference (cosine, ties by neighbor id ascending)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.functions.ann import knn_join, knn_join_ivf


def _make(n, d, seed, id_start=0):
    rng = np.random.RandomState(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(id_start, id_start + n, dtype=np.int64)
    return ids, emb


def _ref_knn(qids, qemb, iids, iemb, k, exclude_self):
    qn = qemb.astype(np.float64)
    qn /= np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-300)
    im = iemb.astype(np.float64)
    im /= np.maximum(np.linalg.norm(im, axis=1, keepdims=True), 1e-300)
    sims = qn @ im.T
    rows = []
    for qi in range(len(qids)):
        cand = [
            (-sims[qi, j], iids[j])
            for j in range(len(iids))
            if not (exclude_self and iids[j] == qids[qi])
        ]
        cand.sort()
        for rank, (negs, nid) in enumerate(cand[:k], 1):
            rows.append((qids[qi], nid, rank, -negs))
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank", "sim"])


def _to_ds(ids, emb, id_col="vec_id"):
    tab = pa.table(
        {
            id_col: pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in emb], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tab).repartition(4)


def _canon(df):
    return (
        df[["query_id", "neighbor_id", "rank"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def test_knn_join_exact_matches_reference():
    qids, qemb = _make(40, 16, seed=1)
    iids, iemb = _make(120, 16, seed=2, id_start=1000)
    out = knn_join(
        _to_ds(qids, qemb), _to_ds(iids, iemb), k=5, out_query_col="query_id"
    ).to_pandas()
    ref = _ref_knn(qids, qemb, iids, iemb, 5, exclude_self=False)
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))
    np.testing.assert_allclose(
        out.sort_values(["query_id", "rank"])["sim"].to_numpy(),
        ref.sort_values(["query_id", "rank"])["sim"].to_numpy(),
        rtol=1e-9,
    )


def test_knn_join_self_exclusion_and_chunking():
    ids, emb = _make(60, 8, seed=3)
    ds = _to_ds(ids, emb)
    out = knn_join(
        ds, ds, k=3, exclude_self=True, index_chunk_rows=17, out_query_col="query_id"
    ).to_pandas()
    ref = _ref_knn(ids, emb, ids, emb, 3, exclude_self=True)
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))
    assert not (out["neighbor_id"] == out["query_id"]).any()


def test_knn_join_k_larger_than_index():
    qids, qemb = _make(5, 4, seed=4)
    iids, iemb = _make(3, 4, seed=5, id_start=100)
    out = knn_join(
        _to_ds(qids, qemb), _to_ds(iids, iemb), k=10, out_query_col="query_id"
    ).to_pandas()
    assert len(out) == 5 * 3
    assert set(out["rank"]) == {1, 2, 3}


def test_knn_join_ivf_exhaustive_is_exact():
    ids, emb = _make(80, 12, seed=6)
    ds = _to_ds(ids, emb)
    out = knn_join_ivf(
        ds, ds, k=4, nlist=5, nprobe=5, exclude_self=True, out_query_col="query_id"
    ).to_pandas()
    ref = _ref_knn(ids, emb, ids, emb, 4, exclude_self=True)
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))


def test_knn_join_ivf_recall_reasonable():
    ids, emb = _make(200, 16, seed=7)
    ds = _to_ds(ids, emb)
    approx = knn_join_ivf(
        ds, ds, k=3, nlist=8, nprobe=4, exclude_self=True, out_query_col="query_id"
    ).to_pandas()
    ref = _ref_knn(ids, emb, ids, emb, 3, exclude_self=True)
    hit = len(
        approx.merge(ref, on=["query_id", "neighbor_id"], how="inner")
    ) / len(ref)
    assert hit >= 0.5  # nprobe/nlist = 0.5 of cells scanned; recall above floor
    # every query must still emit rows, ranks contiguous from 1
    got = approx.groupby("query_id")["rank"].agg(["min", "count"])
    assert (got["min"] == 1).all()
