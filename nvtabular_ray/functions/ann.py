"""Similarity search over an embedding column (list<float>).

- brute_force_topk: baseline exact cosine top-k — per-batch numpy matmul
  against a broadcast query matrix, per-batch partial top-k, tiny global
  top-k reduce (only k rows per batch leave the workers).
- lsh_topk: scale path — random-hyperplane LSH restricts the scan to
  matching buckets (and their Hamming-1 neighbors) before exact re-ranking.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _batch_cosine(t: pa.Table, qvec: np.ndarray, embedding_col: str) -> np.ndarray:
    emb = np.asarray(t.column(embedding_col).to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    q = qvec / (np.linalg.norm(qvec) or 1.0)
    return (emb @ q) / norms


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
    # tiny global reduce: k rows per input block
    rows = partials.take_all()
    ids = np.array([r[id_col] for r in rows])
    sims = np.array([r["sim"] for r in rows])
    order = np.lexsort((ids, -sims))[:k]
    import ray.data as rd

    return rd.from_arrow(pa.table({id_col: pa.array(ids[order]), "sim": pa.array(sims[order])}))


def lsh_topk(
    ds,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    nbits: int = 4,
    seed: int = 7,
):
    """LSH-bucketed approximate top-k: scan only rows whose random-hyperplane
    sign bucket is within Hamming distance 1 of the query's bucket, then
    exact cosine re-rank. At scale this prunes ~ (nbits+1)/2^nbits of data."""
    qvec = np.asarray(query_vec, dtype=np.float64)
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(len(qvec), nbits))
    qbits = (qvec @ planes) > 0
    qbucket = int(qbits @ (1 << np.arange(nbits)))
    near = {qbucket} | {qbucket ^ (1 << b) for b in range(nbits)}

    def prune_and_score(t: pa.Table) -> pa.Table:
        emb = np.asarray(t.column(embedding_col).to_pylist(), dtype=np.float64)
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
    rows = partials.take_all()
    import ray.data as rd

    if not rows:
        return rd.from_arrow(pa.table({id_col: pa.array([]), "sim": pa.array([])}))
    ids = np.array([r[id_col] for r in rows])
    sims = np.array([r["sim"] for r in rows])
    order = np.lexsort((ids, -sims))[:k]
    return rd.from_arrow(pa.table({id_col: pa.array(ids[order]), "sim": pa.array(sims[order])}))
