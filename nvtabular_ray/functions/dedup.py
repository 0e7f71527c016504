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

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.arrow_utils import list_to_numpy_2d
from nvtabular_ray.functions.hashing import (
    hash64,
    hash64_columns,
    hash64_columns_stable,
)

_H = "__h__"


def exact_dedup(ds, key_cols: list[str], order_col: str):
    """Keep, per distinct key tuple, the row with the smallest ``order_col``.
    Shuffle key is the 64-bit hash of the key columns (narrow), not the
    payload; true key equality is re-checked within each hash group."""

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(_H, pa.array(hash64_columns(t, key_cols).astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)

    # task-based hash exchange on _H (not Ray's sort groupby); all rows of a
    # key share a bucket, so one vectorized sort+drop_duplicates over the
    # whole bucket resolves every key at once
    def pick_first(t: pa.Table) -> pa.Table:
        t = t.drop_columns([_H])
        # arrow-native: stable sort by order_col, then ordered group_by
        # "first" (single-threaded group_by preserves table order) — no
        # pandas round-trip, dtypes exact
        srt = t.sort_by([(order_col, "ascending")])
        others = [c for c in t.column_names if c not in key_cols]
        # null-safe: multi-column key sets with nulls hit pyarrow 16.1's
        # multi-key null-group splitting, which would let duplicate null-key
        # rows SURVIVE dedup (arrow_utils.null_safe_group_by docstring); the
        # helper keeps use_threads=False so ordered "first" is preserved
        from nvtabular_ray.arrow_utils import null_safe_group_by

        agg = null_safe_group_by(srt, key_cols, [(c, "first") for c in others])
        # select by NAME before the positional rename: aggregate()'s key
        # column position is pyarrow-version-dependent
        agg = agg.select(key_cols + [f"{c}_first" for c in others])
        agg = agg.rename_columns(key_cols + others)
        return agg.select(t.column_names)

    return bucketed_group_map(hashed, [_H], [], pick_first)


def line_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_dup: int = 2,
    min_line_chars: int = 10,
    sep: str = "\n",
    num_buckets=None,
):
    """Line-level EXACT dedup (the C4/RefinedWeb boilerplate pass): remove
    every line whose exact content occurs >= ``min_dup`` times across the
    whole corpus, considering only lines with >= ``min_line_chars``
    characters — short lines (blanks, bullets, separators) are never
    removed. Documents are reassembled in original line order; a document
    whose every line is removed disappears from the output. Returns
    ``(id_col, text, n_removed)``.

    Scale plan: each line crosses the wire exactly once through a
    content-keyed hash exchange (all copies of a line land in one bucket;
    counting is exact string equality within the bucket, collision-safe).
    Short lines are never counted, so they are salted by (doc, line_idx)
    instead of content — a corpus that is 30% blank lines would otherwise
    pile into one hot bucket. A line hot enough to blow a bucket IS the
    boilerplate being removed; it is filtered inside its reduce task, and
    the 2 GiB bucket warning in the exchange flags it. Reassembly is a
    second id-keyed exchange. No step holds more than one bucket."""
    import pyarrow.compute as pc

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    def explode(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        parts = [("" if s is None else s).split(sep) for s in texts]
        lens = np.fromiter(map(len, parts), dtype=np.int64, count=len(parts))
        total = int(lens.sum())
        flat = [ln for ls in parts for ln in ls]
        # float64 repeats: this host's int64 repeat kernel is a scalar loop
        rep = np.repeat(np.arange(len(parts), dtype=np.float64), lens).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts.astype(np.float64), lens).astype(np.int64)
        out = pa.table(
            {
                id_col: t.column(id_col).take(pa.array(rep)),
                "_lidx": pa.array(idx.astype(np.int32)),
                "line": pa.array(flat, type=pa.string()),
                "_nlines": pa.array(np.repeat(lens.astype(np.float64), lens).astype(np.int32)),
            }
        )
        elig = pc.greater_equal(pc.utf8_length(out.column("line")), min_line_chars)
        lkey = np.where(
            elig.to_numpy(zero_copy_only=False),
            hash64_columns(out, ["line"]),
            hash64_columns(out, [id_col, "_lidx"]),  # never-removed: spread
        ).astype(np.int64)
        return out.append_column("_lkey", pa.array(lkey))

    def drop_dups(t: pa.Table) -> pa.Table:
        elig = pc.greater_equal(pc.utf8_length(t.column("line")), min_line_chars)
        sub = t.filter(elig)
        if sub.num_rows:
            counts = sub.group_by(["line"], use_threads=False).aggregate([("line", "count")])
            dup = counts.filter(pc.greater_equal(counts.column("line_count"), min_dup))
            if dup.num_rows:
                hit = pc.is_in(t.column("line"), value_set=dup.column("line").combine_chunks())
                t = t.filter(pc.invert(pc.and_(elig, hit)))
        return t.drop_columns(["_lkey"])

    def rebuild(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: ids,
                    "text": pa.array([], type=pa.string()),
                    "n_removed": pa.array([], type=pa.int32()),
                }
            )
        idn = ids.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, idn[1:] != idn[:-1]])
        ends = np.r_[starts[1:], len(idn)]
        lines = t.column("line").to_pylist()
        texts = [sep.join(lines[a:b]) for a, b in zip(starts, ends)]
        n_removed = (
            t.column("_nlines").to_numpy(zero_copy_only=False)[starts] - (ends - starts)
        ).astype(np.int32)
        return pa.table(
            {
                id_col: ids.take(pa.array(starts)),
                "text": pa.array(texts, type=pa.string()),
                "n_removed": pa.array(n_removed),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    survivors = bucketed_group_map(
        exploded, ["_lkey"], [], drop_dups, num_buckets=num_buckets, presort=False
    )
    return bucketed_group_map(
        survivors, [id_col], ["_lidx"], rebuild, num_buckets=num_buckets
    )


def dup_span_fraction(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_buckets=None,
):
    """ExactSubstr-lite cross-document duplication score: per document, the
    fraction of its word-n-gram occurrences whose gram also appears in at
    least one OTHER document (the streaming scoring variant of duplicated-
    span flagging — gate or penalize docs made of corpus boilerplate).
    Returns ``(id_col, dup_frac float64, n_spans int64)``.

    Gram spec is the shared ``word_ngrams`` tokenization (lower().split(),
    short docs contribute their whole-doc gram). Scale plan: every gram
    occurrence crosses the wire exactly once through a content-keyed
    exchange (distinct-doc counts are exact string equality within the
    bucket); only (doc, dup, tot) per-bucket partials come back — grams
    never travel twice — and a tiny id-keyed exchange folds the partials."""
    import pyarrow.compute as pc

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    def explode(t: pa.Table) -> pa.Table:
        grams = word_ngrams(t.column(text_col).to_pylist(), n)
        lens = np.fromiter(map(len, grams), dtype=np.int64, count=len(grams))
        rep = np.repeat(np.arange(len(grams), dtype=np.float64), lens).astype(np.int64)
        flat = (
            np.concatenate(grams) if grams else np.empty(0, dtype=object)
        )
        return pa.table(
            {
                id_col: t.column(id_col).take(pa.array(rep)),
                "gram": pa.array(flat.tolist(), type=pa.string()),
            }
        )

    def partials(t: pa.Table) -> pa.Table:
        # unique (gram, doc) pairs with occurrence counts; every occurrence
        # of a gram is in THIS bucket, so distinct-doc counts are global
        # null-safe: gram is always non-null (built from token flats) but a
        # user-supplied id column may carry nulls — multi-key shape of the
        # pyarrow 16.1 null-group bug (arrow_utils.null_safe_group_by)
        from nvtabular_ray.arrow_utils import null_safe_group_by

        pairs = null_safe_group_by(t, ["gram", id_col], [("gram", "count")])
        occ = pairs.column("gram_count")
        docs_per = pairs.group_by(["gram"], use_threads=False).aggregate(
            [("gram", "count")]
        )
        dup_grams = docs_per.filter(
            pc.greater_equal(docs_per.column("gram_count"), 2)
        ).column("gram")
        hit = pc.is_in(pairs.column("gram"), value_set=dup_grams.combine_chunks())
        base = pa.table(
            {
                id_col: pairs.column(id_col),
                "tot": occ,
                "dup": pc.if_else(hit, occ, pa.scalar(0, occ.type)),
            }
        )
        agg = base.group_by([id_col], use_threads=False).aggregate(
            [("dup", "sum"), ("tot", "sum")]
        )
        return agg.select([id_col, "dup_sum", "tot_sum"]).rename_columns(
            [id_col, "dup", "tot"]
        )

    def finalize(t: pa.Table) -> pa.Table:
        agg = t.group_by([id_col], use_threads=False).aggregate(
            [("dup", "sum"), ("tot", "sum")]
        )
        dup = pc.cast(agg.column("dup_sum"), pa.float64())
        tot = pc.cast(agg.column("tot_sum"), pa.float64())
        return pa.table(
            {
                id_col: agg.column(id_col),
                "dup_frac": pc.divide(dup, tot),
                "n_spans": pc.cast(agg.column("tot_sum"), pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    part = bucketed_group_map(
        exploded, ["gram"], [], partials, num_buckets=num_buckets, presort=False
    )
    return bucketed_group_map(
        part, [id_col], [], finalize, num_buckets=num_buckets, presort=False
    )


# ------------------------------------------------------------------ MinHash --
def minhash_perm_constants(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    """PUBLIC permutation constants: (a_j, b_j) for the universal hashes
    sig_j = min over shingles of ((a_j * h + b_j) mod 2^64). Shared by the
    engine and by the DuckDB oracle builder (which embeds the numbers as
    HUGEINT literals), so both compute bit-identical signatures."""
    rng = np.random.RandomState(1729)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(texts, num_perm: int = 16, shingle_k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures.

    PUBLIC spec (SQL-replicable): shingle hash h = md5_60(shingle)
    (functions/hashing.py), permutation j value = (a_j*h + b_j) mod 2^64
    with the minhash_perm_constants numbers; signature = per-doc min.

    Fully vectorized across the batch: ALL shingles of all docs hash in ONE
    dictionary-encoded md5_60 call; each permutation is a single 1-D pass
    with ``np.minimum.reduceat`` over doc boundaries. (A (num_perm, total)
    2-D uint64 broadcast is ~100x slower — numpy falls off the fast path;
    keep the per-perm 1-D loop.)"""
    from nvtabular_ray.functions.hashing import md5_60_char_shingles

    a, b = minhash_perm_constants(num_perm)
    if not len(texts):
        return np.empty((0, num_perm), dtype=np.uint64)
    starts, h = md5_60_char_shingles(texts, shingle_k)
    sigs = np.empty((len(texts), num_perm), dtype=np.uint64)
    for j in range(num_perm):
        sigs[:, j] = np.minimum.reduceat(h * a[j] + b[j], starts)
    return sigs


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    rounds: int = 2,
    num_buckets=None,
):
    """Near-duplicate clustering: shingle -> MinHash -> LSH band buckets ->
    min-label propagation. Returns (id_col, cluster_id): cluster_id is the
    smallest doc id among LSH-connected docs after ``rounds`` propagation
    rounds (connected components converge for chains up to 2^rounds hops).

    FULLY DISTRIBUTED label propagation: every stage is a bucketed shuffle
    over narrow int tables — no driver-side label dict of unbounded
    cardinality (the round-1 version broadcast a (band,band_hash)->label
    python dict, O(bands x n_docs) on the driver):

      rows(band, band_hash, doc)                    one map_batches pass
        -> per-(band,hash) min-label, per-row       bucketed exchange 1
        -> per-doc min over its band labels (L1)    bucketed exchange 2
        -> (rounds-1) x label-of-label join         bucketed exchange each

    Semantics are SQL-replicable (see __ray_entry__ oracle): L1(d) = min doc
    id sharing any band signature tuple with d; final = L1 applied
    ``rounds`` times.
    """
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    rows_per_band = num_perm // bands

    def sig_rows(t: pa.Table) -> pa.Table:
        # pass the Arrow array straight through — md5_60_char_shingles reads
        # the flat UTF-8 buffer zero-copy on its ASCII fast path
        texts = t.column(text_col).combine_chunks()
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sigs = minhash_signatures(texts, num_perm, shingle_k)
        band_ids = np.repeat(np.arange(bands, dtype=np.int32), len(ids))
        doc_ids = np.tile(ids, bands)
        band_hash = np.empty(bands * len(ids), dtype=np.int64)
        band_hash2 = np.empty(bands * len(ids), dtype=np.int64)
        for bnd in range(bands):
            # vectorized row-tuple hash of the band's signature columns.
            # TWO independent 64-bit hashes stand in for tuple equality: a
            # single hash colliding across different signature tuples would
            # merge two unrelated documents' clusters (and label
            # propagation spreads that transitively); a double collision is
            # ~2^-128 per pair per band
            chunk = sigs[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
            tbl = pa.table(
                {f"s{i}": pa.array(chunk[:, i].astype(np.int64)) for i in range(rows_per_band)}
            )
            lo, hi = bnd * len(ids), (bnd + 1) * len(ids)
            band_hash[lo:hi] = hash64_columns(tbl, list(tbl.column_names)).astype(np.int64)
            band_hash2[lo:hi] = hash64_columns_stable(tbl, list(tbl.column_names)).astype(
                np.int64
            )
        return pa.table(
            {
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash),
                "band_hash2": pa.array(band_hash2),
                id_col: pa.array(doc_ids),
            }
        )

    buckets = ds.map_batches(sig_rows, batch_format="pyarrow", zero_copy_batch=True)

    # exchange 1: co-locate each (band, band_hash) group; label each row with
    # the group's min doc id (pure numpy change-point kernel: one lexsort,
    # group min = first id of each run — no pandas copy, dtypes preserved)
    def bucket_min(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False)
        bh2 = t.column("band_hash2").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({id_col: t.column(id_col), "label": t.column(id_col)})
        order = np.lexsort((ids, bh2, bh, band))
        band_s, bh_s, bh2_s, ids_s = band[order], bh[order], bh2[order], ids[order]
        change = np.r_[
            True,
            (band_s[1:] != band_s[:-1])
            | (bh_s[1:] != bh_s[:-1])
            | (bh2_s[1:] != bh2_s[:-1]),
        ]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, len(ids_s)])
        labels = np.repeat(ids_s[starts], sizes)  # ids asc within group -> first = min
        id_type = t.column(id_col).type
        return pa.table(
            {id_col: pa.array(ids_s, id_type), "label": pa.array(labels, id_type)}
        )

    per_row = bucketed_group_map(
        buckets, ["band", "band_hash"], [], bucket_min, num_buckets=num_buckets
    )

    # exchange 2: per-doc min over its band labels -> L1
    def doc_min(t: pa.Table) -> pa.Table:
        res = t.group_by([id_col], use_threads=False).aggregate([("label", "min")])
        # name-based select: aggregate key position is version-dependent
        return res.select([id_col, "label_min"]).rename_columns([id_col, "cluster_id"])

    result = bucketed_group_map(per_row, [id_col], [], doc_min, num_buckets=num_buckets)

    # transitive chains: cluster(d) <- cluster(cluster(d)), as a distributed
    # self-join per round (labels are doc ids, so the "reference side" is the
    # result table itself keyed by doc id)
    for _ in range(rounds - 1):
        result = _label_lookup_join(result, id_col, num_buckets=num_buckets)
    return result


def _label_lookup_join(result, id_col: str, num_buckets=None):
    """One distributed round of cluster_id <- cluster_id[cluster_id]:
    union(data rows keyed by cluster_id, ref rows keyed by doc_id) -> one
    bucketed exchange -> per-bucket pandas merge. Never collects labels."""
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    def pad_data(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key__": t.column("cluster_id").cast(pa.int64()),
                id_col: t.column(id_col),
                "__lbl__": pa.nulls(t.num_rows, pa.int64()),
                "__side__": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def pad_ref(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "__key__": t.column(id_col).cast(pa.int64()),
                id_col: pa.nulls(t.num_rows, t.column(id_col).type),
                "__lbl__": t.column("cluster_id").cast(pa.int64()),
                "__side__": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    both = result.map_batches(pad_data, batch_format="pyarrow").union(
        result.map_batches(pad_ref, batch_format="pyarrow")
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        # arrow-native hash-join replacement: the old pandas merge promoted
        # int64 ids to float64 through the null-padded union (a silent dtype
        # drift the driver's value-hash caught) — searchsorted lookup keeps
        # every dtype exact and skips two full-table copies
        import pyarrow.compute as pc

        is_ref = pc.equal(t.column("__side__"), 1)
        ref = t.filter(is_ref)
        data = t.filter(pc.invert(is_ref))
        rkeys = ref.column("__key__").to_numpy(zero_copy_only=False)
        rlbls = ref.column("__lbl__").to_numpy(zero_copy_only=False)
        dkeys = data.column("__key__").to_numpy(zero_copy_only=False)
        if len(rkeys):
            order = np.argsort(rkeys, kind="mergesort")  # doc ids are unique
            rk, rl = rkeys[order], rlbls[order]
            pos = np.minimum(np.searchsorted(rk, dkeys), len(rk) - 1)
            lbl = np.where(rk[pos] == dkeys, rl[pos], dkeys)
        else:
            lbl = dkeys
        return pa.table(
            {id_col: data.column(id_col), "cluster_id": pa.array(lbl, pa.int64())}
        )

    return bucketed_group_map(both, ["__key__"], [], per_bucket, num_buckets=num_buckets)


# ------------------------------------------------------------------ SimHash --
def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no O(n*64) unpackbits blowup)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_signatures(texts) -> np.ndarray:
    """60-bit SimHash per text over lowercase whitespace tokens.

    PUBLIC spec (SQL-replicable): token hash = md5_60(token); signature bit
    j = 1 iff sum over tokens of (2*bit_j(h)-1) > 0; empty text -> 0.

    Vectorized across the batch: one md5_60 call for all tokens, then 60
    1-D ``np.add.reduceat`` passes over doc boundaries (no per-doc loop)."""
    from nvtabular_ray.functions.hashing import md5_60

    n = len(texts)
    sh = np.zeros(n, dtype=np.uint64)
    toks = [(t or "").lower().split() for t in texts]
    lens = np.array([len(x) for x in toks], dtype=np.int64)
    flat = [w for ws in toks for w in ws]
    if not flat:
        return sh
    h = md5_60(np.array(flat, dtype=object))
    nz = lens > 0
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])[nz]
    nzlens = lens[nz]
    sig_nz = np.zeros(int(nz.sum()), dtype=np.uint64)
    for j in range(60):
        bitj = ((h >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        votes = np.add.reduceat(bitj, starts)
        sig_nz |= np.uint64(1 << j) * (votes * 2 > nzlens).astype(np.uint64)
    sh[nz] = sig_nz
    return sh


def simhash_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    max_bucket_sigs: int = 4096,
):
    """60-bit SimHash over word tokens; docs sharing any of 4 15-bit bands
    become candidates; candidates verified by full Hamming distance.

    With hamming_threshold < 4 bands the band filter is EXHAUSTIVE by
    pigeonhole (<=3 differing bits can touch at most 3 of the 4 bands), so
    cluster_id(d) = min{e : hamming(sig_d, sig_e) <= threshold} exactly —
    which is what the SQL oracle asserts. In-bucket verification first
    collapses to UNIQUE signatures (a skew bucket of identical docs costs
    O(u^2), not O(m^2)); buckets with more than ``max_bucket_sigs`` distinct
    signatures degrade to exact-signature-equality clustering (documented
    cap — only reachable under adversarial skew)."""

    def sim_rows(t: pa.Table) -> pa.Table:
        sh = simhash_signatures(t.column(text_col).to_pylist())
        return pa.table(
            {"__simhash__": pa.array(sh.astype(np.int64)), id_col: t.column(id_col)}
        )

    sigs = ds.map_batches(sim_rows, batch_format="pyarrow", zero_copy_batch=True)

    def explode(t: pa.Table) -> pa.Table:
        s = t.column("__simhash__").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bands = [(s >> np.uint64(15 * b)) & np.uint64(0x7FFF) for b in range(4)]
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), len(ids))),
                "key": pa.array(np.concatenate(bands).astype(np.int64)),
                id_col: pa.array(np.tile(ids, 4)),
                "__simhash__": pa.array(np.tile(s.astype(np.int64), 4)),
            }
        )

    buckets = sigs.map_batches(explode, batch_format="pyarrow")

    def _resolve_group(ids: np.ndarray, sh: np.ndarray) -> np.ndarray:
        """labels for one (band, key) group (>= 2 rows); ids sorted asc."""
        uniq, inv = np.unique(sh, return_inverse=True)
        big = np.iinfo(np.int64).max
        min_id = np.full(len(uniq), big, dtype=np.int64)
        np.minimum.at(min_id, inv, ids)
        if len(uniq) > max_bucket_sigs:
            # documented skew cap: exact-equal signatures only
            return min_id[inv]
        ham = _popcount64(uniq[:, None] ^ uniq[None, :])
        close = ham <= hamming_threshold
        lab = np.min(np.where(close, min_id[None, :], big), axis=1)
        return lab[inv]

    # ONE task-based exchange co-locates all (band, key) groups of a hash
    # bucket; groups of size 1 (the vast majority) are labeled in bulk, only
    # multi-row groups run the Hamming kernel
    def resolve_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sh = t.column("__simhash__").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, key, band))
        band, key, ids, sh = band[order], key[order], ids[order], sh[order]
        n = len(ids)
        labels = ids.copy()
        if n:
            change = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
            starts = np.flatnonzero(change)
            sizes = np.diff(np.r_[starts, n])
            for s, c in zip(starts[sizes > 1], sizes[sizes > 1]):
                labels[s : s + c] = _resolve_group(ids[s : s + c], sh[s : s + c])
        return pa.table({id_col: pa.array(ids), "label": pa.array(labels)})

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    labeled = bucketed_group_map(buckets, ["band", "key"], [], resolve_bucket)

    def doc_min(t: pa.Table) -> pa.Table:
        res = t.group_by([id_col], use_threads=False).aggregate([("label", "min")])
        # name-based select: aggregate key position is version-dependent
        return res.select([id_col, "label_min"]).rename_columns([id_col, "cluster_id"])

    return bucketed_group_map(labeled, [id_col], [], doc_min)


# ------------------------------------------------- n-gram Jaccard / embeddings --
def word_ngrams(texts, n: int, short_doc: str = "whole") -> list:
    """Per-doc object arrays of word n-gram strings — the ONE shared gram
    spec (``lower().split()`` word tokenization, space-joined grams) for
    n-gram Jaccard dedup AND benchmark decontamination, so a tokenization
    tweak can never silently diverge between the two operators.
    ``short_doc="whole"``: a doc with fewer than ``n`` words contributes
    its whole-doc gram (keeps Jaccard defined); ``"skip"``: contributes no
    grams (a short doc cannot contain a full benchmark n-gram)."""
    grams: list[np.ndarray] = []
    for text in texts:
        w = (text or "").lower().split()
        if len(w) < n:
            grams.append(
                np.array([" ".join(w)], dtype=object)
                if short_doc == "whole"
                else np.empty(0, dtype=object)
            )
        else:
            grams.append(
                np.array([" ".join(w[i : i + n]) for i in range(len(w) - n + 1)], dtype=object)
            )
    return grams


def _word_ngram_hashes(texts, n: int):
    """Per-doc sorted-unique uint64 hashes of word n-grams, vectorized: all
    grams of the batch hash in ONE SipHash call, split back by doc."""
    grams = word_ngrams(texts, n, short_doc="whole")
    if not grams:  # empty block (post-filter/limit) must not kill the task
        return []
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

    def _resolve_group(ids: np.ndarray, gsets: list, max_bucket_docs: int = 2048) -> np.ndarray:
        """Exact Jaccard for ALL pairs in one (band, key) group via ONE
        membership-matrix matmul (inter[i,j] = |g_i ∩ g_j|) — no per-pair
        Python loop. m docs with U distinct grams cost an (m x U) float32
        matmul; groups beyond ``max_bucket_docs`` degrade to identical-
        gram-set clustering (documented skew cap)."""
        m = len(ids)
        lens = np.array([len(g) for g in gsets], dtype=np.int64)
        if m > max_bucket_docs:
            # skew cap: cluster only exact-identical gram sets (hash the
            # sorted gram array; gsets are sorted-unique by construction)
            # STABLE per-process-invariant key: builtin hash() is seeded
            # per process, so clustering would differ across workers/runs
            import hashlib

            keys = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(g.tobytes()).digest()[:8], "little")
                    for g in gsets
                ),
                dtype=np.uint64,
                count=m,
            ).astype(np.int64)
            _, kinv = np.unique(keys, return_inverse=True)
            big = np.iinfo(np.int64).max
            min_id = np.full(kinv.max() + 1, big, dtype=np.int64)
            np.minimum.at(min_id, kinv, ids)
            return min_id[kinv]
        concat = np.concatenate(gsets)
        doc_idx = np.repeat(np.arange(m), lens)
        uniq, invg = np.unique(concat, return_inverse=True)
        mem = np.zeros((m, len(uniq)), dtype=np.float32)
        mem[doc_idx, invg] = 1.0
        inter = mem @ mem.T
        union = lens[:, None] + lens[None, :] - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1e-12), 1.0)
        close = jac >= threshold
        np.fill_diagonal(close, True)
        return ids[np.argmax(close, axis=1)]

    # ONE task-based exchange; only multi-row (band, key) groups run the
    # Jaccard kernel (size-1 groups label themselves in bulk)
    def resolve_bucket(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False)
        key = t.column("key").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        # gram sets as numpy views over the list column's flat child buffer
        # (a to_pylist here allocated one Python list per row)
        garr = t.column("__grams__").combine_chunks()
        goff = np.asarray(garr.offsets, dtype=np.int64)
        goff = goff - goff[0]
        gvals = garr.flatten().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, band))
        band, key, ids = band[order], key[order], ids[order]
        n = len(ids)
        labels = ids.copy()
        if n:
            change = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
            starts = np.flatnonzero(change)
            sizes = np.diff(np.r_[starts, n])
            for s, c in zip(starts[sizes > 1], sizes[sizes > 1]):
                rows = order[s : s + c]
                gsets = [gvals[goff[r] : goff[r + 1]] for r in rows]
                labels[s : s + c] = _resolve_group(ids[s : s + c], gsets)
        return pa.table({id_col: pa.array(ids), "label": pa.array(labels)})

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    labeled = bucketed_group_map(buckets, ["band", "key"], [], resolve_bucket)

    def doc_min(t: pa.Table) -> pa.Table:
        res = t.group_by([id_col], use_threads=False).aggregate([("label", "min")])
        # name-based select: aggregate key position is version-dependent
        return res.select([id_col, "label_min"]).rename_columns([id_col, "cluster_id"])

    return bucketed_group_map(labeled, [id_col], [], doc_min)


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Word n-gram Jaccard similarity (driver-side verification kernel)."""
    def grams(t):
        w = (t or "").lower().split()
        return set(tuple(w[i : i + n]) for i in range(max(len(w) - n + 1, 1)))

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(len(ga | gb), 1)


def _cosine_min_label(
    ids: np.ndarray, emb: np.ndarray, threshold: float, max_bucket_rows: int
) -> np.ndarray:
    """min-id cosine-near-dup labels for ONE candidate group (ids sorted
    asc — first True column of the close-matrix IS the min id). Groups
    beyond ``max_bucket_rows`` degrade to exact-equal embedding clustering
    (identical vectors always share every bucket, so true duplicates are
    never lost by the cap)."""
    if len(ids) <= 1:
        return ids.astype(np.int64, copy=True)
    if len(ids) > max_bucket_rows:
        view = np.ascontiguousarray(emb).view(
            np.dtype((np.void, emb.dtype.itemsize * emb.shape[1]))
        ).ravel()
        _, kinv = np.unique(view, return_inverse=True)
        big = np.iinfo(np.int64).max
        min_id = np.full(kinv.max() + 1, big, dtype=np.int64)
        np.minimum.at(min_id, kinv, ids)
        return min_id[kinv]
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = emb / norms
    close = (unit @ unit.T) >= threshold
    first = np.argmax(close, axis=1)
    # a row with NO close column (a zero vector: its self-cosine is 0 after
    # the norm clamp) must keep its own id — argmax over all-False returns
    # 0, which would silently label it a duplicate of the bucket's min id
    has = close[np.arange(len(ids)), first]
    return np.where(has, ids[first], ids).astype(np.int64)


def embedding_near_dup(
    ds,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_buckets=None,
    seed: int = 7,
    target_bucket_rows: int = 1024,
    max_bucket_rows: int = 65536,
):
    """Embedding-cosine near-dup via random-hyperplane LSH: bucket by sign
    pattern of ``nbits`` random projections, verify cosine within buckets
    (vectorized matmul), emit (id, cluster_id=min id of near-dups).

    SCALE: ``num_buckets=None`` (default) sizes nbits so the EXPECTED bucket
    holds ~``target_bucket_rows`` rows (nbits grows with the dataset — the
    round-1 fixed 16 buckets made verification all-pairs in disguise at
    scale). Verification cost per bucket is O(rows^2 * dim); buckets beyond
    ``max_bucket_rows`` (hyperplane-skewed data) degrade to exact-equal
    embedding clustering — identical vectors always share every bucket, so
    true duplicates are never lost by the cap."""
    if num_buckets is None:
        n = ds.count()  # parquet metadata count: no data scan
        nbits = max(4, int(np.ceil(np.log2(max(n, 1) / target_bucket_rows + 1))))
    else:
        nbits = max(1, int(np.log2(num_buckets)))

    state: dict = {}

    def bucketize(t: pa.Table) -> pa.Table:
        emb = list_to_numpy_2d(t.column(embedding_col))
        if t.num_rows == 0:
            # an empty block must not poison the planes cache with dim 0
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    id_col: t.column(id_col),
                    embedding_col: t.column(embedding_col),
                }
            )
        # cache keyed by the REAL embedding dim: batches from the same
        # worker reuse the matrix, a dim change (schema error) recomputes
        # instead of crashing on a shape mismatch
        if state.get("dim") != emb.shape[1]:
            rng = np.random.RandomState(seed)
            state["planes"] = rng.normal(size=(emb.shape[1], nbits))
            state["dim"] = emb.shape[1]
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

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    # task-based hash exchange on the LSH bucket id (not Ray's sort groupby);
    # the per-group loop inside one exchange bucket is over LSH buckets, each
    # resolved by one matmul (the matmul dominates, not the loop). Embeddings
    # decode ONCE per exchange bucket via the flat-buffer reshape — no
    # per-row Python objects.
    def resolve_bucket(t: pa.Table) -> pa.Table:
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        emb = list_to_numpy_2d(t.column(embedding_col))
        order = np.lexsort((ids, bucket))
        bucket, ids, emb = bucket[order], ids[order], emb[order]
        labels = np.empty(len(ids), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]]) if len(ids) else []
        bounds = np.r_[starts, len(ids)] if len(ids) else np.array([0])
        for s, e in zip(bounds[:-1], bounds[1:]):
            labels[s:e] = _cosine_min_label(
                ids[s:e], emb[s:e], threshold, max_bucket_rows
            )
        return pa.table(
            {id_col: pa.array(ids), "cluster_id": pa.array(labels, pa.int64())}
        )

    return bucketed_group_map(bucketed, ["bucket"], [], resolve_bucket)


def semantic_dedup(
    ds,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    nlist: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    sample_rows: int = 50_000,
    max_bucket_rows: int = 65536,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    coarse k-means partitions the embedding space, pairwise cosine is
    verified only WITHIN a cluster, near-dups (cos >= threshold) collapse to
    the min member id.

    Ray-native plan: centroids train once on a driver-side sample
    (IVFIndex.train — small, broadcast via closure capture), assignment is a
    vectorized matmul per batch, and the only shuffle is ONE groupby on the
    cluster id. Each row is probed into its ``nprobe`` nearest centroids so
    near-dup pairs that straddle a k-means boundary still meet in at least
    one shared cluster; the final per-id min over probe copies happens in the
    same groupby pass (no extra exchange: cluster labels are ids, min is
    associative).

    SCALE: verification is O(rows^2 * dim) per cluster — nlist should grow
    with the dataset (rows/nlist ~ thousands). Clusters beyond
    ``max_bucket_rows`` degrade to exact-equal embedding clustering, which
    never loses a true duplicate (identical vectors share every probe set).
    """
    from nvtabular_ray.functions.ann import IVFIndex

    index = IVFIndex.train(ds, nlist=nlist, sample_rows=sample_rows, seed=seed,
                           embedding_col=embedding_col)
    cents = index.centroids  # (nlist, dim), unit-norm
    k = min(nprobe, cents.shape[0])

    def probe(t: pa.Table) -> pa.Table:
        emb = list_to_numpy_2d(t.column(embedding_col))
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (emb / norms) @ cents.T
        # top-nprobe centroids per row (exact order irrelevant — set semantics)
        near = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        n = len(emb)
        rep = np.repeat(np.arange(n), k)
        return pa.table(
            {
                "cluster": pa.array(near.ravel().astype(np.int64)),
                id_col: t.column(id_col).take(pa.array(rep)),
                embedding_col: t.column(embedding_col).take(pa.array(rep)),
            }
        )

    probed = ds.map_batches(probe, batch_format="pyarrow")

    from nvtabular_ray.functions.aggregates import bucketed_aggregate
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    # task-based hash exchange on the k-means cluster id; per-group loop
    # inside an exchange bucket runs over (at most nlist) clusters, each a
    # single matmul. Embeddings decode once per bucket (flat-buffer reshape).
    def resolve_bucket(t: pa.Table) -> pa.Table:
        cluster = t.column("cluster").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        emb = list_to_numpy_2d(t.column(embedding_col))
        order = np.lexsort((ids, cluster))
        cluster, ids, emb = cluster[order], ids[order], emb[order]
        labels = np.empty(len(ids), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, cluster[1:] != cluster[:-1]]) if len(ids) else []
        bounds = np.r_[starts, len(ids)] if len(ids) else np.array([0])
        for s, e in zip(bounds[:-1], bounds[1:]):
            labels[s:e] = _cosine_min_label(
                ids[s:e], emb[s:e], threshold, max_bucket_rows
            )
        return pa.table(
            {id_col: pa.array(ids), "cluster_id": pa.array(labels, pa.int64())}
        )

    per_probe = bucketed_group_map(probed, ["cluster"], [], resolve_bucket)

    # collapse the nprobe copies of each id to its min label (small exchange:
    # two int64 columns)
    def unalias(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t.column(id_col), "cluster_id": t.column("min(cluster_id)")})

    return bucketed_aggregate(per_probe, [id_col], {"cluster_id": "min"}).map_batches(
        unalias, batch_format="pyarrow"
    )


def dedup_incremental(
    ds_new,
    ds_seen,
    key_cols: list[str],
    order_col: str,
    dedup_new: bool = True,
    broadcast: bool = False,
    num_buckets=None,
):
    """Incremental exact dedup: keep rows of ``ds_new`` whose key tuple does
    NOT appear in ``ds_seen`` (the already-ingested corpus) — the shard-
    ingestion hygiene pass that makes repeated crawls append-only. With
    ``dedup_new`` (default) the new shard is also deduplicated against
    itself, keeping the smallest ``order_col`` per key (so the op is a
    strict superset of ``exact_dedup`` run against seen ∪ new).

    Scale design: the seen side never ships payload — each seen batch
    contributes its DISTINCT 64-bit key hashes (8 B/row before batch-level
    dedup) into the same content-keyed hash exchange the new rows ride, so
    membership is a per-bucket ``np.isin``. At 10^12 seen docs the exchange
    moves only hashes; no driver-side set, no full-corpus materialization.
    ``broadcast=True`` is the small-seen-side fast path (an eval set, a
    blocklist, yesterday's delta): the sorted unique hash array is
    ``ray.put`` once and membership is one ``searchsorted`` inside a single
    streaming pass over the new shard — no shuffle at all. Matching is
    hash-equality (SipHash-64): P(any false drop) ~ n_new * n_seen / 2^64,
    negligible and deterministic for the fixed seed.
    """
    import ray as _ray

    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    _SRC = "__src__"

    def add_hash_new(t: pa.Table) -> pa.Table:
        return t.append_column(_H, pa.array(hash64_columns(t, key_cols).astype(np.int64)))

    def seen_hashes(t: pa.Table) -> pa.Table:
        h = np.unique(hash64_columns(t, key_cols).astype(np.int64))
        return pa.table({_H: pa.array(h, pa.int64())})

    new_h = ds_new.map_batches(add_hash_new, batch_format="pyarrow", zero_copy_batch=True)

    if broadcast:
        tabs = [
            t
            for t in _ray.get(
                ds_seen.map_batches(
                    seen_hashes, batch_format="pyarrow", zero_copy_batch=True
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        seen = (
            np.unique(np.concatenate([t.column(_H).to_numpy() for t in tabs]))
            if tabs
            else np.empty(0, np.int64)
        )
        seen_ref = _ray.put(seen) if _ray.is_initialized() else seen

        def drop_member(t: pa.Table) -> pa.Table:
            s = _ray.get(seen_ref) if _ray.is_initialized() else seen_ref
            if len(s) == 0:  # empty seen corpus (bootstrap run): keep all
                return t
            h = t.column(_H).to_numpy()
            pos = np.searchsorted(s, h)
            member = (pos < len(s)) & (s[np.minimum(pos, len(s) - 1)] == h)
            return t.filter(pa.array(~member))

        survivors = new_h.map_batches(drop_member, batch_format="pyarrow", zero_copy_batch=True)
        if not dedup_new:
            return survivors.drop_columns([_H])
        return bucketed_group_map(
            survivors, [_H], [], _first_per_hash(order_col), num_buckets=num_buckets
        )

    # shuffle path: one content-keyed exchange carries new rows + seen hashes
    def tag_new(t: pa.Table) -> pa.Table:
        return t.append_column(_SRC, pa.array(np.ones(t.num_rows, np.int8)))

    tagged_new = new_h.map_batches(tag_new, batch_format="pyarrow", zero_copy_batch=True)
    new_schema = tagged_new.schema().base_schema

    def pad_seen(t: pa.Table) -> pa.Table:
        h = seen_hashes(t)
        n = h.num_rows
        cols = {}
        for f in new_schema:
            if f.name == _H:
                cols[_H] = h.column(_H)
            elif f.name == _SRC:
                cols[_SRC] = pa.array(np.zeros(n, np.int8))
            else:
                # explicit typed nulls: null-padding must NOT drift dtypes
                cols[f.name] = pa.nulls(n, f.type)
        return pa.table(cols)

    seen_tagged = ds_seen.map_batches(pad_seen, batch_format="pyarrow", zero_copy_batch=True)
    union = tagged_new.union(seen_tagged)

    resolve_first = _first_per_hash(order_col)

    def resolve(t: pa.Table) -> pa.Table:
        src = t.column(_SRC).to_numpy(zero_copy_only=False)
        h = t.column(_H).to_numpy(zero_copy_only=False)
        new_rows = t.filter(pa.array(src == 1)).drop_columns([_SRC])
        member = np.isin(new_rows.column(_H).to_numpy(zero_copy_only=False), h[src == 0])
        fresh = new_rows.filter(pa.array(~member))
        if not dedup_new:
            return fresh.drop_columns([_H])
        return resolve_first(fresh)

    return bucketed_group_map(union, [_H], [], resolve, num_buckets=num_buckets)


def _first_per_hash(order_col: str):
    """Bucket resolver: smallest ``order_col`` row per key hash (the
    exact_dedup pick-first kernel, shared by the incremental paths)."""

    def pick_first(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        srt = t.sort_by([(order_col, "ascending")])
        others = [c for c in t.column_names if c != _H]
        agg = srt.group_by([_H], use_threads=False).aggregate([(c, "first") for c in others])
        agg = agg.select([f"{c}_first" for c in others]).rename_columns(others)
        return agg.select([c for c in t.column_names if c != _H])

    return pick_first


def conversation_dedup(
    ds,
    entity_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
    content_col: str = "event_type",
    sep: str = "\x1f",
    num_buckets=None,
):
    """Whole-conversation exact dedup: two conversations are duplicates when
    their ORDERED content sequences are byte-identical (the transcript-level
    analogue of document exact-dedup — same thread re-ingested under a new
    id, mirrored channels, replayed sessions).

    Plan (both stages narrow, no full-payload shuffle):
      1. per-entity ordered concat of ``content_col`` — ONE bucketed
         exchange keyed on the entity (the Groupby 'concat' aggregate);
      2. fingerprint = md5_60(sequence) (PUBLIC spec, SQL-replayable);
      3. keeper = min(entity) per fingerprint — a second exchange over the
         narrow (entity, fp) pairs only, one row per CONVERSATION (not per
         turn), so stage-2 traffic is ~|entities| regardless of turns.

    Returns (entity, fp, keeper, is_keeper:int64) — callers filter
    ``is_keeper == 1`` or join back to drop duplicate conversations.

    Partitioning assumption (documented bound): stage 1 renders each
    conversation's full sequence as ONE string inside its bucket, so
    per-task memory is O(largest conversation's content), not O(bucket).
    That holds to ~10^7-turn entities on 64 GiB workers; a 10^8-turn
    mega-conversation needs a chained fingerprint (per-segment md5 folded
    in ts order — hot-split carry shape) instead of materialized concat,
    at the cost of SQL-oracle replayability. Not implemented until a
    workload needs it; this guard documents the cliff.
    """
    from nvtabular_ray import Workflow, ops
    from nvtabular_ray.functions.hashing import md5_60
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    node = [entity_col, *order_cols, content_col] >> ops.Groupby(
        groupby_cols=entity_col,
        sort_cols=list(order_cols),
        aggs={content_col: ["concat"]},
        concat_sep=sep,
    )
    seq = Workflow(node).fit(ds).transform(ds)
    seq_col = f"{content_col}_concat"

    def add_fp(t: pa.Table) -> pa.Table:
        fp = md5_60(t.column(seq_col)).astype(np.int64)
        out = pa.table({entity_col: t.column(entity_col), "fp": pa.array(fp)})
        return out.append_column(_H, pa.array(hash64_columns(out, ["fp"]).astype(np.int64)))

    pairs = seq.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)

    def mark(t: pa.Table) -> pa.Table:
        t = t.drop_columns([_H]).sort_by(
            [("fp", "ascending"), (entity_col, "ascending")]
        )
        if t.num_rows == 0:
            return pa.table(
                {
                    entity_col: t.column(entity_col),
                    "fp": t.column("fp"),
                    "keeper": pa.array([], t.column(entity_col).type),
                    "is_keeper": pa.array([], pa.int64()),
                }
            )
        fp = t.column("fp").to_numpy()
        first = np.empty(len(fp), dtype=bool)
        first[0] = True
        np.not_equal(fp[1:], fp[:-1], out=first[1:])
        # sorted by entity within fp: the group's first row is its keeper
        ent = t.column(entity_col).to_numpy()
        keeper = ent[np.maximum.accumulate(np.where(first, np.arange(len(fp)), 0))]
        return pa.table(
            {
                entity_col: t.column(entity_col),
                "fp": t.column("fp"),
                "keeper": pa.array(keeper),
                "is_keeper": pa.array(first.astype(np.int64)),
            }
        )

    return bucketed_group_map(pairs, [_H], [], mark, num_buckets=num_buckets)
