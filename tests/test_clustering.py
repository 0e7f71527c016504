"""Distributed k-means / assignment / PQ-encode vs serial numpy references."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.functions.clustering import assign_clusters, fit_kmeans, pq_encode


def _ds(emb, ids=None):
    n = len(emb)
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64) if ids is None else ids),
            "embedding": pa.array(
                [list(map(float, r)) for r in emb], pa.list_(pa.float32())
            ),
        }
    )
    return rd.from_arrow(tab).repartition(5)


def _serial_lloyd(x, init, iters, metric="l2"):
    cent = init.astype(np.float64).copy()
    for _ in range(iters):
        if metric == "cosine":
            cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
            xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
            a = np.argmax(xn @ cn.T, axis=1)
        else:
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
        for j in range(len(cent)):
            m = a == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
        if metric == "cosine":
            cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
    return cent


def test_fit_kmeans_matches_serial_l2():
    rng = np.random.RandomState(0)
    x = np.concatenate(
        [rng.normal(loc=c, scale=0.3, size=(50, 6)) for c in (-3.0, 0.0, 3.0)]
    ).astype(np.float32)
    init = x[:3].astype(np.float64)
    got = fit_kmeans(_ds(x), 3, init=init, iters=4, tol=0.0)
    want = _serial_lloyd(x.astype(np.float64), init, 4)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_fit_kmeans_cosine_normalized():
    rng = np.random.RandomState(1)
    x = rng.normal(size=(80, 8)).astype(np.float32)
    init = x[:4].astype(np.float64)
    got = fit_kmeans(_ds(x), 4, init=init, iters=3, metric="cosine", tol=0.0)
    want = _serial_lloyd(x.astype(np.float64), init / np.linalg.norm(init, axis=1, keepdims=True), 3, "cosine")
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-9)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_empty_cluster_keeps_centroid():
    x = np.array([[0.0, 0.0], [0.1, 0.0], [1.0, 1.0]], dtype=np.float32)
    init = np.array([[0.0, 0.0], [1.0, 1.0], [99.0, 99.0]])  # third captures nothing
    got = fit_kmeans(_ds(x), 3, init=init, iters=2, tol=0.0)
    np.testing.assert_allclose(got[2], [99.0, 99.0])


def test_assign_clusters_matches_argmin():
    rng = np.random.RandomState(2)
    x = rng.normal(size=(60, 5)).astype(np.float32)
    cent = rng.normal(size=(4, 5))
    out = assign_clusters(_ds(x), cent).to_pandas().sort_values("vec_id")
    d = ((x[:, None, :].astype(np.float64) - cent[None, :, :]) ** 2).sum(axis=2)
    np.testing.assert_array_equal(out["cluster_id"].to_numpy(), np.argmin(d, axis=1))
    assert "embedding" not in out.columns  # dropped by default: narrow output


def test_pq_encode_matches_per_subspace_argmin():
    rng = np.random.RandomState(3)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    books = [rng.normal(size=(4, 4)), rng.normal(size=(4, 4))]
    out = pq_encode(_ds(x), books).to_pandas().sort_values("vec_id")
    codes = np.stack(out["pq_code"].to_numpy())
    for j, b in enumerate(books):
        sub = x[:, j * 4 : (j + 1) * 4].astype(np.float64)
        d = ((sub[:, None, :] - b[None, :, :]) ** 2).sum(axis=2)
        np.testing.assert_array_equal(codes[:, j], np.argmin(d, axis=1))


def test_pq_encode_dim_mismatch_raises():
    x = np.zeros((3, 6), dtype=np.float32)
    with pytest.raises(Exception):
        pq_encode(_ds(x), [np.zeros((4, 4))]).to_pandas()
