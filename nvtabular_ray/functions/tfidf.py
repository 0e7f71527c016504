"""TF-IDF keyword extraction: per-document top-k distinctive terms.

The classic corpus-statistics feature the reference engine lacks (its
Categorify/JoinGroupby fit collects per-CATEGORY statistics,
/root/reference/nvtabular/ops/categorify.py:85; nothing tokenizes free
text) — part of the LLM-pipeline extension mandate (SURVEY §2).

Tokenization is deliberately SQL-reproducible: ``lower(text)`` split on
``[^a-z0-9]+`` (one Arrow C call per batch via ``_flat_tokens``), so the
whole operator has an exact DuckDB oracle
(``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))`` — both
engines run RE2-class regexes and utf8proc case mapping).

Scale design (100 TB corpus):

- **tf is batch-local.** A document lives in one row, so term frequencies
  per (doc, term) come from ONE Arrow hash ``group_by`` per batch — no
  shuffle carries token-level rows.
- **df is a pre-aggregated exchange.** Each batch emits (term, partial
  document count) — vocabulary-sized, not token-sized — and one Ray
  ``groupby("term").sum`` combines partials. The only all-to-all in the
  operator moves rows bounded by per-batch DISTINCT terms.
- **The vocabulary is the broadcast side.** After the ``min_df`` floor
  (and optional ``max_vocab`` cap by descending df), the (term, df) table
  is ``ray.put`` once and read zero-copy by every scoring task. The
  operator assumes the post-floor vocabulary fits in one node's memory —
  the standard assumption (heavy-tail terms are exactly what ``min_df``
  removes); raise ``min_df`` or set ``max_vocab`` when it doesn't.
- **Scoring/selection streams.** The second pass re-tokenizes (tokenize
  twice rather than materialize a token-level intermediate), joins each
  batch's tf table against the broadcast vocabulary with Arrow's C++ hash
  join, and picks top-k per doc with one sort + segment-rank — no
  driver-side loops.

``rank_by="count"`` orders by (tf DESC, df ASC, term ASC) — an
integer-deterministic ranking with an exact SQL oracle. ``rank_by="score"``
orders by true tf-idf ``tf * ln(N / df)`` (ties broken by term) and adds a
``score`` column; selection near float ties is engine-dependent at the ulp
level, so the driver row uses "count" and "score" is pinned by unit tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.functions.text import _flat_tokens

_TOKEN_SPLIT = "[^a-z0-9]+"


def _doc_term_tf(t: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Batch-local (id, term, tf): one tokenize + one Arrow hash group_by."""
    id_type = t.schema.field(id_col).type
    empty = pa.table(
        {id_col: pa.array([], id_type), "term": pa.array([], pa.string()),
         "tf": pa.array([], pa.int64())}
    )
    if t.num_rows == 0:
        return empty
    col = pc.utf8_lower(t.column(text_col).combine_chunks())
    offsets, toks = _flat_tokens(col, split_pattern=_TOKEN_SPLIT)
    counts = np.diff(offsets)
    # host quirk: np.repeat with array counts is ~20x faster on float64
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.float64), counts).astype(np.int64)
    nonempty = pc.greater(pc.binary_length(toks), 0).to_numpy(zero_copy_only=False)
    if not nonempty.any():
        return empty
    pairs = pa.table(
        {"_doc": pa.array(doc_idx[nonempty]), "term": toks.filter(pa.array(nonempty))}
    )
    # multi-key group is null-free by construction (_doc is arange-derived,
    # term filtered non-empty) so pyarrow 16.1's multi-key null-group bug
    # cannot bite here (arrow_utils.null_safe_group_by docstring)
    agg = pairs.group_by(["_doc", "term"]).aggregate([("_doc", "count")])
    return pa.table(
        {
            id_col: t.column(id_col).take(agg.column("_doc")),
            "term": agg.column("term"),
            "tf": agg.column("_doc_count").cast(pa.int64()),
        }
    )


def build_vocabulary(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_vocab: int | None = None,
    return_doc_count: bool = False,
    merge: str = "driver",
):
    """(term, df) document frequencies with df >= min_df, as one driver-side
    Arrow table (the broadcast side). The exchange is pre-aggregated: each
    batch ships DISTINCT terms only. ``return_doc_count``: also return the
    corpus document count, piggybacked on the same scan as a reserved
    empty-string row ("" can never be a token — empties are filtered), so
    idf needs NO extra pass over the corpus.

    ``merge="driver"`` (default): partials fan in on the driver
    (grouped_reduce) — fastest at moderate vocab, guarded by a 2 GiB
    accumulator limit. ``merge="bucketed"``: one term-keyed hash exchange
    combines partials AND applies the ``min_df`` floor inside each bucket,
    so only the post-floor vocabulary ever reaches the driver — the 100 TB
    path, where the raw heavy-tail vocabulary (every typo is a term) would
    blow the driver fan-in."""
    if merge not in ("driver", "bucketed"):
        raise ValueError(f"merge must be 'driver' or 'bucketed', got {merge!r}")

    def partial(t: pa.Table) -> pa.Table:
        tf = _doc_term_tf(t, text_col, id_col)
        # one row per (doc, term) -> rows per term = partial df
        agg = tf.group_by(["term"]).aggregate([("term", "count")])
        return pa.table(
            {
                "term": pa.concat_arrays(
                    [agg.column("term").combine_chunks().cast(pa.string()),
                     pa.array([""], pa.string())]
                ),
                "df_partial": pa.concat_arrays(
                    [agg.column("term_count").combine_chunks().cast(pa.int64()),
                     pa.array([t.num_rows], pa.int64())]
                ),
            }
        )

    # merge partials with the driver fan-in every stat fit uses: the
    # vocabulary is driver-small BY CONTRACT (it broadcasts next), and
    # Ray's sort-based groupby costs ~2s of fixed overhead for the same
    # result (aggregates.py module note)
    from nvtabular_ray.functions.aggregates import grouped_reduce

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if merge == "bucketed":
        import ray as _ray

        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        merged = bucketed_aggregate(
            partials, ["term"], {"df_partial": "sum"}, names="keep"
        )

        def floor_filter(t: pa.Table) -> pa.Table:
            keep = pc.or_(
                pc.greater_equal(t.column("df_partial"), min_df),
                pc.equal(t.column("term"), ""),  # keep the doc-count sentinel
            )
            return t.filter(keep)

        floored = merged.map_batches(floor_filter, batch_format="pyarrow", zero_copy_batch=True)
        tabs = [t for t in _ray.get(floored.to_arrow_refs()) if t.num_rows]
        if tabs:
            df = pa.concat_tables(tabs).combine_chunks().to_pandas()
        else:
            import pandas as _pd

            df = _pd.DataFrame(columns=["term", "df_partial"])
    else:
        df = grouped_reduce(partials, ["term"], {"df_partial": "sum"}, memory_limit=2 << 30)
    n_docs = 0
    if len(df):
        sentinel = df["term"] == ""
        if sentinel.any():
            n_docs = int(df.loc[sentinel, "df_partial"].iloc[0])
        df = df[~sentinel]
    if not len(df):
        vocab = pa.table({"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
        return (vocab, n_docs) if return_doc_count else vocab
    vocab = pa.table(
        {
            "term": pa.array(df["term"], pa.string()),
            "df": pa.array(df["df_partial"].to_numpy(), pa.int64()),
        }
    )
    vocab = vocab.filter(pc.greater_equal(vocab.column("df"), min_df))
    if max_vocab is not None and vocab.num_rows > max_vocab:
        vocab = vocab.sort_by([("df", "descending"), ("term", "ascending")]).slice(0, max_vocab)
    vocab = vocab.combine_chunks()
    return (vocab, n_docs) if return_doc_count else vocab


def distinctive_terms(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 2,
    max_vocab: int | None = None,
    rank_by: str = "count",
):
    """Top-k distinctive terms per document (see module docstring).

    Returns (id, term, tf, df, rank[, score]) — one row per selected term;
    documents with no qualifying term emit no rows (SQL join parity)."""
    if rank_by not in ("count", "score"):
        raise ValueError(f"rank_by must be 'count' or 'score', got {rank_by!r}")
    import ray as _ray

    vocab, n_docs = build_vocabulary(
        ds, text_col, id_col, min_df=min_df, max_vocab=max_vocab, return_doc_count=True
    )
    vocab_ref = _ray.put(vocab) if _ray.is_initialized() else vocab

    def score_batch(t: pa.Table) -> pa.Table:
        v = _ray.get(vocab_ref) if _ray.is_initialized() else vocab_ref
        tf = _doc_term_tf(t, text_col, id_col)
        j = tf.join(v, keys="term", join_type="inner")
        if rank_by == "score":
            idf = np.log(float(n_docs) / j.column("df").to_numpy(zero_copy_only=False))
            score = j.column("tf").to_numpy(zero_copy_only=False) * idf
            j = j.append_column("score", pa.array(score, pa.float64()))
            sort_keys = [(id_col, "ascending"), ("score", "descending"), ("term", "ascending")]
        else:
            sort_keys = [
                (id_col, "ascending"), ("tf", "descending"),
                ("df", "ascending"), ("term", "ascending"),
            ]
        j = j.sort_by(sort_keys).combine_chunks()
        if j.num_rows == 0:
            return j.append_column("rank", pa.array([], pa.int64()))
        from nvtabular_ray.functions.grouped_np import group_ids_sorted, group_starts

        gid = group_ids_sorted(j, [id_col])
        starts = group_starts(gid)
        gstart = np.repeat(starts, np.diff(np.r_[starts, len(gid)]))
        rank = np.arange(len(gid), dtype=np.int64) - gstart + 1
        j = j.append_column("rank", pa.array(rank, pa.int64()))
        return j.filter(pa.array(rank <= k))

    return ds.map_batches(score_batch, batch_format="pyarrow", zero_copy_batch=True)
