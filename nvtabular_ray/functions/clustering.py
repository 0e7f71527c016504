"""Distributed k-means over an embedding column, Ray-Data-first.

Reference scope: NVTabular has no clustering op; this generalizes the
coarse-quantizer k-means that already lives inside ``functions/ann.py``
(IVFIndex.train — sample-based) and ``functions/dedup.py`` (semantic_dedup)
into a FULL-DATA distributed fit a corpus pipeline can use directly:
SemDeDup-style cluster-then-dedup, IVF index builds, domain discovery,
and product-quantization codebooks (``pq_encode``).

Scale plan (every piece streams):
- fit_kmeans: per Lloyd iteration, ONE streaming pass — centroids broadcast
  via ``ray.put``, each block emits a (k x d) partial-sum matrix + k counts
  (a few KB regardless of block rows), and a fan-in-64 tree of tiny Ray
  tasks reduces the partials so the driver only ever holds O(fan_in) of
  them. No shuffle, no block materialization; wall time = iters x one
  map pass.
- assign_clusters / pq_encode: stateless map_batches against broadcast
  codebooks — embarrassingly parallel.

Determinism: explicit ``init`` centroids (or a seeded driver-side sample),
argmin ties broken by lowest cluster id (numpy argmin semantics), empty
clusters keep their previous centroid. Identical partitioning-independent
results because per-cluster sums are exact up to float addition order and
the final assignment is a pure function of the final centroids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import list_to_numpy_2d

_FANIN = 64


def _pairwise_sq_l2(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances without the (n, k, d) intermediate."""
    # ||x||^2 - 2 x.c + ||c||^2 ; the ||x||^2 term is rank-constant and
    # irrelevant for argmin but kept so values are real distances
    return (
        (x * x).sum(axis=1, keepdims=True)
        - 2.0 * (x @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )


def _assign_batch(x: np.ndarray, cent: np.ndarray, metric: str) -> np.ndarray:
    if metric == "cosine":
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-300)
        return np.argmax((x / norms) @ cn.T, axis=1)
    return np.argmin(_pairwise_sq_l2(x, cent), axis=1)


def _sum_blob_tables(tabs) -> tuple[np.ndarray, np.ndarray] | None:
    import pickle

    acc = None
    for t in tabs:
        if "blob" not in t.column_names:
            continue  # Ray collapses an all-empty block to a 0-column table
        for b in t.column("blob").to_pylist():
            s, n = pickle.loads(b)
            if acc is None:
                acc = (s.copy(), n.copy())
            else:
                acc[0][...] += s
                acc[1][...] += n
    return acc


def _reduce_partials(blob_ds) -> tuple[np.ndarray, np.ndarray] | None:
    """Tree-sum the per-block (k x d sums, k counts) partials. Few blocks:
    one driver pass. Many blocks (wide clusters): a fan-in-64 tree of tiny
    Ray tasks so the driver holds O(fan_in) partials, never O(blocks)."""
    import pickle

    import ray

    refs = list(blob_ds.to_arrow_refs())
    if len(refs) > _FANIN:

        @ray.remote(num_cpus=0.5)
        def merge(*tabs):
            acc = _sum_blob_tables(tabs)
            if acc is None:
                return pa.table({"blob": pa.array([], pa.binary())})
            return pa.table({"blob": pa.array([pickle.dumps(acc)])})

        while len(refs) > _FANIN:
            refs = [
                merge.remote(*refs[i : i + _FANIN]) for i in range(0, len(refs), _FANIN)
            ]
    return _sum_blob_tables(ray.get(refs))


def _sample_init(ds, k: int, embedding_col: str, sample_rows: int, seed: int) -> np.ndarray:
    # iter_batches, NOT to_arrow_refs: to_arrow_refs() fetches the schema
    # via an internal limit(1) re-plan that hits a Ray 2.49 AssertionError
    # on limit-over-union plans containing an empty branch (reproduced:
    # from_arrow(10 rows).union(filtered-empty).limit(5).to_arrow_refs())
    tabs = [
        t
        for t in ds.limit(sample_rows)
        .select_columns([embedding_col])
        .iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    ]
    if not tabs:
        raise ValueError("fit_kmeans: empty input")
    x = np.concatenate([list_to_numpy_2d(t.column(embedding_col)) for t in tabs])
    rng = np.random.RandomState(seed)
    return x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()


def fit_kmeans(
    ds,
    k: int,
    *,
    embedding_col: str = "embedding",
    iters: int = 10,
    metric: str = "l2",
    init: np.ndarray | None = None,
    sample_rows: int = 100_000,
    seed: int = 17,
    tol: float = 1e-6,
) -> np.ndarray:
    """Full-data distributed Lloyd's; returns the (k, d) centroid matrix.

    Each iteration is one streaming pass emitting tiny per-block partials
    (see module docstring); ``init`` pins the starting centroids for
    deterministic, SQL-reproducible fits."""
    import ray

    cent = (
        np.asarray(init, dtype=np.float64).copy()
        if init is not None
        else _sample_init(ds, k, embedding_col, sample_rows, seed)
    )
    k = len(cent)
    proj = ds.select_columns([embedding_col])
    for _ in range(iters):
        cent_ref = ray.put(cent) if ray.is_initialized() else cent

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref) if ray.is_initialized() else _ref
            x = list_to_numpy_2d(t.column(embedding_col))
            if len(x) == 0:
                return pa.table({"blob": pa.array([], pa.binary())})
            a = _assign_batch(x, c, metric)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c)).astype(np.int64)
            import pickle

            return pa.table({"blob": pa.array([pickle.dumps((sums, counts))])})

        blobs = proj.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        acc = _reduce_partials(blobs)
        if acc is None:
            raise ValueError("fit_kmeans: empty input")
        s, n = acc
        new = cent.copy()
        nz = n > 0
        new[nz] = s[nz] / n[nz, None]
        if metric == "cosine":
            norms = np.linalg.norm(new, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            new = new / norms
        shift = float(np.max(np.linalg.norm(new - cent, axis=1))) if k else 0.0
        cent = new
        if shift < tol:
            break
    return cent


def assign_clusters(
    ds,
    centroids: np.ndarray,
    *,
    embedding_col: str = "embedding",
    out_col: str = "cluster_id",
    metric: str = "l2",
    keep_embedding: bool = False,
):
    """Stateless assignment pass: nearest-centroid id per row (ties -> lowest
    cluster id). Centroids broadcast once; output drops the embedding column
    by default so downstream exchanges stay narrow."""
    import ray

    cent = np.asarray(centroids, dtype=np.float64)
    cent_ref = ray.put(cent) if ray.is_initialized() else cent

    def per_batch(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref) if ray.is_initialized() else cent_ref
        x = list_to_numpy_2d(t.column(embedding_col))
        a = (
            _assign_batch(x, c, metric).astype(np.int64)
            if len(x)
            else np.empty(0, dtype=np.int64)
        )
        out = t if keep_embedding else t.drop_columns([embedding_col])
        return out.append_column(out_col, pa.array(a))

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def pq_encode(
    ds,
    codebooks: list[np.ndarray],
    *,
    embedding_col: str = "embedding",
    out_col: str = "pq_code",
    keep_embedding: bool = False,
):
    """Product-quantization encode: split each d-dim embedding into
    ``len(codebooks)`` contiguous subvectors and store the nearest-centroid
    index per subspace (L2, ties -> lowest code). Output is a
    ``list<int64>`` code column — m integers instead of d floats, the
    compressed representation ANN-at-scale ships instead of raw vectors.

    Codebooks come from ``fit_kmeans`` on sliced embeddings (or any
    external trainer); they broadcast once, encoding is stateless."""
    import ray

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dims = [b.shape[1] for b in books]
    book_ref = ray.put(books) if ray.is_initialized() else books

    def per_batch(t: pa.Table) -> pa.Table:
        bs = ray.get(book_ref) if ray.is_initialized() else book_ref
        x = list_to_numpy_2d(t.column(embedding_col))
        n = len(x)
        if n and x.shape[1] != sum(dims):
            raise ValueError(
                f"pq_encode: embedding dim {x.shape[1]} != codebook dims {dims}"
            )
        codes = np.empty((n, len(bs)), dtype=np.int64)
        off = 0
        for j, b in enumerate(bs):
            codes[:, j] = _assign_batch(x[:, off : off + dims[j]], b, "l2") if n else 0
            off += dims[j]
        flat = pa.array(codes.ravel(), pa.int64())
        offsets = pa.array(np.arange(n + 1, dtype=np.int32) * len(bs))
        code_col = pa.ListArray.from_arrays(offsets, flat)
        out = t if keep_embedding else t.drop_columns([embedding_col])
        return out.append_column(out_col, code_col)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
