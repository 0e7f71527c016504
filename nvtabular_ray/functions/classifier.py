"""Hashed linear text classifier scoring — the fastText-style quality/domain
classifier pass every large-scale LLM data pipeline runs (CCNet/RefinedWeb
style "score every document with a cheap linear model, filter on the score").

Model = a dense weight vector over ``dim`` hashed token buckets + bias:

    bucket(tok) = md5_60(tok) % dim          (the repo's PUBLIC hash spec)
    x           = bag-of-buckets, L1-normalized (token-mean)
    score       = sigmoid(mean_j w[bucket(tok_j)] + bias)

Ray design: the weight vector is ``ray.put`` ONCE and resolved per actor in
``__init__`` (broadcast model, never re-shipped per batch); scoring is one
Arrow tokenize + one numpy gather/segment-mean per batch — no Python row
loop. At 100 TB the stage is embarrassingly parallel: no shuffle, model
read-only in the object store, actor-pool ``map_batches``.

The md5-bucket spec (functions/hashing.py:182) keeps scores exactly
replicable by an independent SQL engine, so a driver oracle can check the
whole path (tokenize -> hash -> gather -> mean -> sigmoid) to the digit.
The reference has no classifier stage — new scope; the actor-pool pattern
mirrors its stat-cache transform workers (categorify.py:1627-1643).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from nvtabular_ray.functions.hashing import md5_60


def default_weights(dim: int) -> np.ndarray:
    """Deterministic, SQL-replicable weight vector in [-1, 1):

        w[j] = ((j * 2654435761) % (2*Q)) / Q - 1,  Q = 1024

    (Knuth multiplicative constant; any SQL engine reproduces it as
    ``((b * 2654435761) % 2048) / 1024.0 - 1.0``.) Real deployments pass
    trained weights instead — the scoring path is identical."""
    j = np.arange(dim, dtype=np.int64)
    return ((j * 2654435761) % 2048).astype(np.float64) / 1024.0 - 1.0


class HashedLinearScorer:
    """Actor-pool stage: broadcast weights resolved once per actor."""

    def __init__(
        self,
        weights,
        bias: float,
        dim: int,
        text_col: str,
        out_col: str,
    ):
        import ray

        if isinstance(weights, ray.ObjectRef):
            weights = ray.get(weights)
        self.w = np.ascontiguousarray(weights, dtype=np.float64)
        if len(self.w) != dim:
            raise ValueError(f"weights length {len(self.w)} != dim {dim}")
        self.bias = float(bias)
        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nvtabular_ray.functions.text import _flat_tokens

        offsets, toks = _flat_tokens(t.column(self.text_col))
        nonempty = np.asarray(pc.greater(pc.utf8_length(toks), 0))
        tw = np.zeros(len(toks), dtype=np.float64)
        if nonempty.any():
            buckets = (md5_60(toks) % np.uint64(self.dim)).astype(np.int64)
            tw = np.where(nonempty, self.w[buckets], 0.0)
        csum = np.concatenate([[0.0], np.cumsum(tw)])
        sums = csum[offsets[1:]] - csum[offsets[:-1]]
        ccnt = np.concatenate([[0], np.cumsum(nonempty, dtype=np.int64)])
        counts = ccnt[offsets[1:]] - ccnt[offsets[:-1]]
        mean = np.divide(sums, counts, out=np.zeros(len(counts)), where=counts > 0)
        score = 1.0 / (1.0 + np.exp(-(mean + self.bias)))
        return t.append_column(self.out_col, pa.array(score, pa.float64()))


def classifier_score(
    ds,
    text_col: str = "text",
    dim: int = 1024,
    weights: Optional[np.ndarray] = None,
    bias: float = 0.0,
    out_col: str = "clf_score",
    concurrency=(1, 4),
    batch_size: int = 4096,
):
    """Append ``out_col`` = sigmoid(token-mean hashed-bucket weight + bias)
    per row. ``weights`` defaults to :func:`default_weights` (deterministic
    placeholder); pass a trained (dim,) vector for a real classifier."""
    import ray

    w = default_weights(dim) if weights is None else np.asarray(weights, dtype=np.float64)
    w_ref = ray.put(w)
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={
            "weights": w_ref,
            "bias": bias,
            "dim": dim,
            "text_col": text_col,
            "out_col": out_col,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def default_logprobs(dim: int) -> np.ndarray:
    """Deterministic, SQL-replicable per-bucket log-probabilities in (-8, 0]:

        lp[j] = -((j * 2654435761) % 2048) / 256.0

    (same Knuth-constant idiom as :func:`default_weights`; a SQL engine
    reproduces it as ``-((b * 2654435761) % 2048) / 256.0``). Real
    deployments pass counts-derived log-probs from a trained n-gram LM —
    the scoring path is identical."""
    j = np.arange(dim, dtype=np.int64)
    return -((j * 2654435761) % 2048).astype(np.float64) / 256.0


class HashedBigramLM:
    """Actor-pool stage: CCNet-style n-gram LM perplexity scoring.

    ppl(doc) = exp(-mean_i lp[bucket(w_i + ' ' + w_{i+1})]) over the doc's
    whitespace-token bigrams; docs with fewer than 2 tokens score exp(0)=1.
    The bucket is the repo's PUBLIC md5_60 spec over the space-joined bigram
    string, so an independent SQL engine replays the whole path. The log-prob
    table is broadcast (``ray.put`` once, resolved per actor in __init__)."""

    def __init__(self, logprobs, dim: int, text_col: str, out_col: str):
        import ray

        if isinstance(logprobs, ray.ObjectRef):
            logprobs = ray.get(logprobs)
        self.lp = np.ascontiguousarray(logprobs, dtype=np.float64)
        if len(self.lp) != dim:
            raise ValueError(f"logprobs length {len(self.lp)} != dim {dim}")
        self.dim = dim
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nvtabular_ray.functions.text import _flat_tokens

        offsets, toks = _flat_tokens(t.column(self.text_col))
        nonempty = np.asarray(pc.greater(pc.utf8_length(toks), 0))
        n_rows = len(offsets) - 1
        # per-row FILTERED token runs: drop empty tokens, keep adjacency
        row_of = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))
        frow = row_of[nonempty]
        ftoks = pc.array_filter(toks, pa.array(nonempty))
        mean_lp = np.zeros(n_rows, dtype=np.float64)
        if len(ftoks) > 1:
            # bigram exists where positions i, i+1 sit in the same row
            same = frow[:-1] == frow[1:]
            if same.any():
                same_arr = pa.array(same)
                left = pc.array_filter(ftoks.slice(0, len(ftoks) - 1), same_arr)
                right = pc.array_filter(ftoks.slice(1), same_arr)
                bigrams = pc.binary_join_element_wise(left, right, " ")
                lp = self.lp[(md5_60(bigrams) % np.uint64(self.dim)).astype(np.int64)]
                brow = frow[:-1][same]
                # segment mean per row over the flat bigram run
                sums = np.bincount(brow, weights=lp, minlength=n_rows)
                counts = np.bincount(brow, minlength=n_rows)
                np.divide(sums, counts, out=mean_lp, where=counts > 0)
        ppl = np.exp(-mean_lp)
        return t.append_column(self.out_col, pa.array(ppl, pa.float64()))


def lm_perplexity(
    ds,
    text_col: str = "text",
    dim: int = 1024,
    logprobs: Optional[np.ndarray] = None,
    out_col: str = "ppl",
    concurrency=(1, 4),
    batch_size: int = 4096,
):
    """Append ``out_col`` = hashed-bigram LM perplexity per row (the CCNet
    quality-filter shape: score every doc with a cheap LM, filter on ppl)."""
    import ray

    lp = default_logprobs(dim) if logprobs is None else np.asarray(logprobs, dtype=np.float64)
    lp_ref = ray.put(lp)
    return ds.map_batches(
        HashedBigramLM,
        fn_constructor_kwargs={
            "logprobs": lp_ref,
            "dim": dim,
            "text_col": text_col,
            "out_col": out_col,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
