"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / The Pile style):
any training document containing an n-gram (n ≈ 13 words in production;
configurable) that also appears in a benchmark document is contamination —
it would leak eval answers into training. Reference scope: the reference
engine has no decontamination op; this is part of the LLM-pipeline
extension mandate (SURVEY §2 extension table).

Scale design (100 TB corpus, MB-scale benchmark — the realistic shape):

- The benchmark side is SMALL by construction (eval suites are thousands
  of documents). Its n-gram set is built once, hashed to a sorted uint64
  array, and broadcast via ``ray.put`` — every scan task reads it
  zero-copy from the local object store. No shuffle, no join: the corpus
  side is ONE streaming ``map_batches`` pass.
- Per batch, all documents' grams hash in one vectorized SipHash call
  (reusing the dedup machinery), membership is one ``np.searchsorted``
  against the broadcast array, and per-doc hit counts are a segment-sum.
  Nothing is per-row Python beyond the unavoidable string split.
- 64-bit hashing makes the membership test probabilistic only in the
  cryptographic sense: P(any false hit) ≈ (corpus grams × bench grams)
  / 2**64 — negligible and deterministic for a fixed seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.functions.hashing import hash64


def _doc_ngram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(bounds, flat) where flat[bounds[i]:bounds[i+1]] is doc i's
    sorted-UNIQUE uint64 word-n-gram hashes. Gram strings come from the
    SHARED builder (dedup.word_ngrams — one tokenization spec for dedup
    and decontamination) with ``short_doc="skip"``: a doc with fewer than
    ``n`` words contributes zero grams (it cannot contain a full benchmark
    n-gram — unlike Jaccard dedup, which needs whole-doc fallback)."""
    from nvtabular_ray.functions.dedup import word_ngrams

    grams = [np.unique(g) for g in word_ngrams(texts, n, short_doc="skip")]
    lens = np.array([len(g) for g in grams], dtype=np.int64)
    bounds = np.concatenate([[0], np.cumsum(lens)])
    nonempty = [g for g in grams if len(g)]
    if not nonempty:
        return bounds, np.empty(0, dtype=np.uint64)
    flat_strs = np.concatenate(nonempty)
    h = hash64(pd.Series(flat_strs, dtype=object))
    # re-unique per doc is unnecessary: grams were unique as strings and a
    # same-doc hash collision would only undercount by the collision itself
    return bounds, h.astype(np.uint64, copy=False)


def build_benchmark_ngrams(benchmark, n: int = 13, text_col: str = "text") -> np.ndarray:
    """Sorted unique uint64 n-gram hash array for the benchmark side.

    ``benchmark`` may be a list[str], a pyarrow Table, or a (small)
    Ray Dataset — eval suites fit on the driver by definition; this is the
    one deliberate collect in the operator."""
    if isinstance(benchmark, (list, tuple)):
        texts = list(benchmark)
    elif isinstance(benchmark, pa.Table):
        texts = benchmark.column(text_col).to_pylist()
    else:  # Ray Dataset
        import ray as _ray

        tabs = _ray.get(benchmark.select_columns([text_col]).to_arrow_refs())
        texts = [x for t in tabs for x in t.column(text_col).to_pylist()]
    _, flat = _doc_ngram_hashes(texts, n)
    return np.unique(flat)


def decontaminate(
    ds,
    benchmark,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    mode: str = "flag",
):
    """Scan ``ds`` for word-n-gram overlap with ``benchmark``.

    mode="flag": returns (id_col, n_gram_hits, contaminated) — hit count =
    number of DISTINCT doc n-grams present in the benchmark set,
    contaminated = 1 when n_gram_hits >= min_hits (int64 for driver
    dtype-kind stability).
    mode="remove": returns the input rows (all columns) with contaminated
    documents dropped — the "clean the corpus" form.
    """
    if mode not in ("flag", "remove"):
        raise ValueError(f"mode must be 'flag' or 'remove', got {mode!r}")
    bench = build_benchmark_ngrams(benchmark, n=n, text_col=text_col)
    import ray as _ray

    bench_ref = _ray.put(bench) if _ray.is_initialized() else bench

    def scan(t: pa.Table) -> pa.Table:
        b = _ray.get(bench_ref) if _ray.is_initialized() else bench_ref
        texts = t.column(text_col).to_pylist()
        bounds, flat = _doc_ngram_hashes(texts, n)
        if len(flat) and len(b):
            pos = np.searchsorted(b, flat)
            member = (pos < len(b)) & (b[np.minimum(pos, len(b) - 1)] == flat)
            c = np.concatenate([[0], np.cumsum(member, dtype=np.int64)])
            hits = c[bounds[1:]] - c[bounds[:-1]]
        else:
            hits = np.zeros(t.num_rows, dtype=np.int64)
        contaminated = (hits >= min_hits).astype(np.int64)
        if mode == "remove":
            return t.filter(pa.array(contaminated == 0))
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_gram_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(contaminated, pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
