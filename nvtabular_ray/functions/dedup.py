"""Deduplication at scale: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup. (New scope beyond the reference — SURVEY.md §2.3
notes the reference has no general dedup operator.)

All are Ray-Data-native: vectorized signature computation in map_batches,
ONE groupby shuffle on a hash/bucket key, per-group vectorized resolution.
Document payloads never ride through the shuffle unless semantically needed
(exact dedup groups on a 64-bit content hash and only compares full keys
within hash groups — collision-safe without shuffling full text twice).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.functions.hashing import hash64, hash64_columns

_H = "__h__"


def exact_dedup(ds, key_cols: list[str], order_col: str):
    """Keep, per distinct key tuple, the row with the smallest ``order_col``.
    Shuffle key is the 64-bit hash of the key columns (narrow), not the
    payload; true key equality is re-checked within each hash group."""

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(_H, pa.array(hash64_columns(t, key_cols).astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    def pick_first(group: pd.DataFrame) -> pd.DataFrame:
        out = (
            group.sort_values(order_col, kind="mergesort")
            .drop_duplicates(subset=key_cols, keep="first")
            .drop(columns=[_H])
        )
        return out

    return hashed.groupby(_H).map_groups(pick_first, batch_format="pandas")


# ------------------------------------------------------------------ MinHash --
def _char_shingles(text: str, k: int = 5) -> np.ndarray:
    if len(text) < k:
        return np.array([text], dtype=object)
    return np.array([text[i : i + k] for i in range(len(text) - k + 1)], dtype=object)


def minhash_signatures(texts, num_perm: int = 64, shingle_k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures.

    Fully vectorized across the batch: ALL shingles of all docs hash in ONE
    SipHash call; each of the ``num_perm`` universal hashes ((a*h+b) mod
    2^64) is a single 1-D pass with ``np.minimum.reduceat`` over doc
    boundaries. (A (num_perm, total) 2-D uint64 broadcast is ~100x slower —
    numpy falls off the fast path; keep the per-perm 1-D loop.)"""
    rng = np.random.RandomState(1729)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    if not len(texts):
        return np.empty((0, num_perm), dtype=np.uint64)
    shingles = [_char_shingles(t or "", shingle_k) for t in texts]
    lens = np.array([len(s) for s in shingles], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    h = hash64(pd.Series(np.concatenate(shingles), dtype=object))
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    for j in range(num_perm):
        sigs[:, j] = np.minimum.reduceat(h * a[j] + b[j], starts)
    return sigs


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    rounds: int = 2,
):
    """Near-duplicate clustering: shingle -> MinHash -> LSH band buckets ->
    min-label propagation. Returns (id_col, cluster_id): cluster_id is the
    smallest doc id among LSH-connected docs after ``rounds`` propagation
    rounds (connected components converge for chains up to 2^rounds hops).
    """
    rows_per_band = num_perm // bands

    def sig_rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = minhash_signatures(texts, num_perm, shingle_k)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
        doc_ids = np.tile(ids, bands)
        band_hash = np.empty(bands * len(ids), dtype=np.int64)
        for bnd in range(bands):
            chunk = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            band_hash[bnd * len(ids) : (bnd + 1) * len(ids)] = hash64(
                pd.Series([chunk[i].tobytes() for i in range(len(ids))])
            ).astype(np.int64)
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash),
                id_col: pa.array(doc_ids),
            }
        )

    buckets = ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)

    # Min-label propagation, all VECTORIZED (no per-group Python):
    #   bucket label = min doc id per (band, band_hash)   [map-side combine +
    #   streaming reduce]; doc label = min over its bucket labels, applied by
    #   a broadcast hash lookup inside map_batches. The bucket->label table
    #   is ~bands x n_docs rows of ints; at 10^9-doc scale swap the broadcast
    #   for Dataset.join (hash-partitioned) — same dataflow, bigger exchange.
    from nvtabular_ray.functions.aggregates import grouped_reduce

    def bucket_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = df.groupby(["band", "band_hash"], observed=True, sort=False)[id_col].min()
        return pa.Table.from_pandas(out.rename("label").reset_index(), preserve_index=False)

    bucket_labels = grouped_reduce(
        buckets.map_batches(bucket_partial, batch_format="pyarrow"),
        ["band", "band_hash"],
        {"label": "min"},
    )
    bucket_labels["key"] = (
        bucket_labels["band"].astype("int64") * (1 << 32) ^ bucket_labels["band_hash"].astype("int64")
    )
    lookup = dict(zip(bucket_labels["key"], bucket_labels["label"]))

    import ray

    lookup_ref = ray.put(lookup) if ray.is_initialized() else lookup

    def doc_label(t: pa.Table) -> pa.Table:
        # stateless task; ray.get of the broadcast lookup is object-store
        # local (zero-copy read, once per task)
        table = ray.get(lookup_ref) if ray.is_initialized() else lookup_ref
        df = t.to_pandas()
        key = df["band"].astype("int64") * (1 << 32) ^ df["band_hash"].astype("int64")
        df["label"] = key.map(table)
        out = df.groupby(id_col, observed=True, sort=False)["label"].min()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    doc_partials = buckets.map_batches(doc_label, batch_format="pyarrow")
    result = grouped_reduce(doc_partials, [id_col], {"label": "min"})
    result = result.rename(columns={"label": "cluster_id"})

    # transitive chains: doc -> label -> that doc's label (cheap driver rounds
    # over the small (doc, cluster) frame)
    for _ in range(rounds - 1):
        mapping = dict(zip(result[id_col], result["cluster_id"]))
        result["cluster_id"] = result["cluster_id"].map(mapping).fillna(result["cluster_id"])

    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(result, preserve_index=False))


# ------------------------------------------------------------------ SimHash --
def simhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id", hamming_threshold: int = 3):
    """64-bit SimHash over word tokens; docs sharing any of 4 16-bit bands
    become candidates; candidates verified by full Hamming distance."""

    def sim_rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sh = np.empty(len(texts), dtype=np.uint64)
        for i, text in enumerate(texts):
            toks = (text or "").lower().split()
            if not toks:
                sh[i] = 0
                continue
            hs = hash64(pd.Series(toks, dtype=object))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            vote = bits.sum(axis=0) * 2 - len(hs)
            sh[i] = np.packbits((vote > 0)[::-1]).view(">u8")[0]
        out = {"__simhash__": pa.array(sh.astype(np.int64)), id_col: t.column(id_col)}
        return pa.table(out)

    sigs = ds.map_batches(sim_rows, batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        s = t.column("__simhash__").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bands = [(s >> np.uint64(16 * b)) & np.uint64(0xFFFF) for b in range(4)]
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), len(ids))),
                "key": pa.array(np.concatenate(bands).astype(np.int64)),
                id_col: pa.array(np.tile(ids, 4)),
                "__simhash__": pa.array(np.tile(s.astype(np.int64), 4)),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({id_col: group[id_col], "cluster_id": group[id_col]})
        sh = group["__simhash__"].to_numpy().astype(np.uint64)
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        sh, ids = sh[order], ids[order]
        xor = sh[:, None] ^ sh[None, :]
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2).sum(axis=2)
        labels = ids.copy()
        close = ham <= hamming_threshold
        labels = ids[np.argmax(close, axis=1)]  # first (smallest-id) close doc
        return pd.DataFrame({id_col: ids, "cluster_id": labels})

    labeled = buckets.groupby(["band", "key"]).map_groups(resolve, batch_format="pandas")
    return labeled.groupby(id_col).map_groups(
        lambda g: pd.DataFrame({id_col: [g[id_col].iloc[0]], "cluster_id": [g["cluster_id"].min()]}),
        batch_format="pandas",
    )


# ------------------------------------------------- n-gram Jaccard / embeddings --
def _word_ngram_hashes(texts, n: int):
    """Per-doc sorted-unique uint64 hashes of word n-grams, vectorized: all
    grams of the batch hash in ONE SipHash call, split back by doc."""
    grams: list[np.ndarray] = []
    for text in texts:
        w = (text or "").lower().split()
        if len(w) < n:
            grams.append(np.array([" ".join(w)], dtype=object))
        else:
            grams.append(
                np.array([" ".join(w[i : i + n]) for i in range(len(w) - n + 1)], dtype=object)
            )
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    h = hash64(pd.Series(np.concatenate(grams), dtype=object))
    return [np.unique(h[bounds[i] : bounds[i + 1]]) for i in range(len(texts))]


def ngram_jaccard_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 4,
):
    """Near-dup clustering by word n-gram Jaccard: candidates from
    ``num_hashes`` independent min-hash buckets over the n-gram set, then
    EXACT Jaccard verification inside each bucket (the int n-gram hash set —
    not the text — rides the shuffle). cluster_id = smallest doc id whose
    verified Jaccard >= threshold."""
    rng = np.random.RandomState(4242)
    a = rng.randint(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)

    def rows(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        gsets = _word_ngram_hashes(texts, n)
        bucket = np.empty(num_hashes * len(ids), dtype=np.int64)
        for j in range(num_hashes):
            bucket[j * len(ids) : (j + 1) * len(ids)] = np.array(
                [np.min(g * a[j] + b[j]) for g in gsets], dtype=np.uint64
            ).astype(np.int64)
        gram_col = pa.array(
            [g.astype(np.int64) for g in gsets] * num_hashes, pa.list_(pa.int64())
        )
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(num_hashes, dtype=np.int32), len(ids))),
                "key": pa.array(bucket),
                id_col: pa.array(np.tile(ids, num_hashes)),
                "__grams__": gram_col,
            }
        )

    buckets = ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({id_col: ids, "cluster_id": ids})
        order = np.argsort(ids)
        ids = ids[order]
        gsets = [np.asarray(g, dtype=np.int64) for g in group["__grams__"].to_numpy()[order]]
        m = len(ids)
        close = np.eye(m, dtype=bool)
        for i in range(m):
            for j in range(i + 1, m):
                inter = len(np.intersect1d(gsets[i], gsets[j], assume_unique=True))
                union = len(gsets[i]) + len(gsets[j]) - inter
                if union == 0 or inter / union >= threshold:
                    close[i, j] = close[j, i] = True
        labels = ids[np.argmax(close, axis=1)]
        return pd.DataFrame({id_col: ids, "cluster_id": labels})

    labeled = buckets.groupby(["band", "key"]).map_groups(resolve, batch_format="pandas")

    def doc_min(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [g[id_col].iloc[0]], "cluster_id": [g["cluster_id"].min()]})

    return labeled.groupby(id_col).map_groups(doc_min, batch_format="pandas")


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard similarity (driver-side verification kernel)."""
    def grams(t):
        w = (t or "").lower().split()
        return set(tuple(w[i : i + n]) for i in range(max(len(w) - n + 1, 1)))

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(len(ga | gb), 1)


def embedding_near_dup(
    ds,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_buckets: int = 16,
    seed: int = 7,
):
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by sign
    pattern of ``log2(num_buckets)`` random projections, verify cosine within
    buckets (vectorized matmul), emit (id, cluster_id=min id of near-dups)."""
    nbits = int(np.log2(num_buckets))

    state: dict = {}

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.asarray(t.column(embedding_col).to_pylist(), dtype=np.float64)
        if "planes" not in state:
            rng = np.random.RandomState(seed)
            state["planes"] = rng.normal(size=(emb.shape[1], nbits))
        signs = (emb @ state["planes"]) > 0
        bucket = signs @ (1 << np.arange(nbits))
        return pa.table(
            {
                "bucket": pa.array(bucket.astype(np.int64)),
                id_col: t.column(id_col),
                embedding_col: t.column(embedding_col),
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        emb = np.asarray(list(group[embedding_col]), dtype=np.float64)
        ids = group[id_col].to_numpy()
        order = np.argsort(ids)
        emb, ids = emb[order], ids[order]
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = emb / norms
        cos = unit @ unit.T
        close = cos >= threshold
        labels = ids[np.argmax(close, axis=1)]
        return pd.DataFrame({id_col: ids, "cluster_id": labels})

    return bucketed.groupby("bucket").map_groups(resolve, batch_format="pandas")
