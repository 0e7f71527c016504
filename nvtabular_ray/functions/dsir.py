"""DSIR-style data selection via importance resampling (public method:
Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — hashed n-gram importance weights + Gumbel top-k).

Per document: logw = sum over hashed token buckets of
log(p_target[b] / p_raw[b]); selection = the n documents maximizing
logw + Gumbel noise (sampling without replacement proportional to
exp(logw) — the Gumbel-top-k identity). Here the noise is DETERMINISTIC:
a Gumbel transform of the repo's PUBLIC md5_60 hash of the doc id, so the
whole path (tokenize -> bucket -> log-ratio sum -> Gumbel key -> top-n)
is replicable to the digit by an independent SQL engine, is
partition-order invariant, and re-runs reproducibly at any cluster size.
Real deployments pass corpus-estimated ``log_ratios``; the selection
path is identical.

Ray design: scoring is an actor-pool ``map_batches`` with the log-ratio
vector ``ray.put`` once and resolved in ``__init__`` (broadcast model, no
shuffle — embarrassingly parallel at 100 TB); the top-n is a per-block
partial top-n (only n rows per block leave the workers) merged by the
shared shuffle-free fan-in reduce from ``functions/ann.py``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from nvtabular_ray.functions.hashing import md5_60

_TWO52 = float(1 << 52)


def default_log_ratios(dim: int) -> np.ndarray:
    """Deterministic, SQL-replicable log(p_target/p_raw) per bucket in
    [-0.5, 0.5): ``((j * 2654435761) % 2048) / 2048.0 - 0.5`` (the same
    Knuth-constant idiom as classifier.default_weights)."""
    j = np.arange(dim, dtype=np.int64)
    return ((j * 2654435761) % 2048).astype(np.float64) / 2048.0 - 0.5


def gumbel_from_ids(ids) -> np.ndarray:
    """Deterministic Gumbel(0,1) noise from the PUBLIC md5_60 spec:
    u = ((md5_60(str(id)) % 2^52) + 0.5) / 2^52, g = -ln(-ln u). SQL:
    ``-ln(-ln(((('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
    % 4503599627370496) + 0.5) / 4503599627370496.0))``."""
    h = md5_60(ids) % np.uint64(1 << 52)
    u = (h.astype(np.float64) + 0.5) / _TWO52
    return -np.log(-np.log(u))


class DsirScorer:
    """Actor-pool stage: broadcast log-ratio vector resolved once per
    actor; per batch one Arrow tokenize + one numpy gather/segment-sum."""

    def __init__(self, log_ratios, dim: int, text_col: str, out_col: str):
        import ray

        if isinstance(log_ratios, ray.ObjectRef):
            log_ratios = ray.get(log_ratios)
        self.lr = np.ascontiguousarray(log_ratios, dtype=np.float64)
        if len(self.lr) != dim:
            raise ValueError(f"log_ratios length {len(self.lr)} != dim {dim}")
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
            tw = np.where(nonempty, self.lr[buckets], 0.0)
        csum = np.concatenate([[0.0], np.cumsum(tw)])
        logw = csum[offsets[1:]] - csum[offsets[:-1]]
        return t.append_column(self.out_col, pa.array(logw, pa.float64()))


def dsir_score(
    ds,
    text_col: str = "text",
    dim: int = 1024,
    log_ratios: Optional[np.ndarray] = None,
    out_col: str = "dsir_logw",
    concurrency=(1, 4),
    batch_size: int = 4096,
):
    """Append ``out_col`` = sum of hashed-bucket log importance ratios over
    the document's whitespace tokens (empty doc -> 0.0)."""
    import ray

    lr = default_log_ratios(dim) if log_ratios is None else np.asarray(log_ratios, np.float64)
    lr_ref = ray.put(lr)
    return ds.map_batches(
        DsirScorer,
        fn_constructor_kwargs={
            "log_ratios": lr_ref,
            "dim": dim,
            "text_col": text_col,
            "out_col": out_col,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def dsir_resample(
    ds,
    n: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1024,
    log_ratios: Optional[np.ndarray] = None,
    logw_col: str = "dsir_logw",
):
    """Select ``n`` documents by Gumbel-top-k over the DSIR importance
    weights (= sampling without replacement proportional to exp(logw),
    with deterministic public-hash noise). Returns an (id_col, dsir_logw)
    Dataset of the selected docs, ties broken by id ascending.

    Scale: each block contributes at most n candidate rows to the
    shuffle-free fan-in merge — no global sort, no full-data exchange."""
    from nvtabular_ray.functions.ann import _final_topk

    scored = dsir_score(ds, text_col=text_col, dim=dim, log_ratios=log_ratios, out_col=logw_col)

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        logw = t.column(logw_col).to_numpy(zero_copy_only=False)
        key = logw + gumbel_from_ids(t.column(id_col))
        m = min(n, len(key))
        idx = np.argpartition(-key, m - 1)[:m] if len(key) > m else np.arange(len(key))
        return pa.table(
            {
                id_col: pa.array(ids[idx]),
                "sim": pa.array(key[idx]),
                logw_col: pa.array(logw[idx]),
            }
        )

    partials = scored.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # _final_topk merges on (sim desc, id asc) and returns (id, sim); join
    # the logw back is unnecessary — recompute key->logw by subtracting the
    # deterministic noise keeps the output self-contained without a join
    top = _final_topk(partials, n, id_col)

    def restore(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        key = t.column("sim").to_numpy(zero_copy_only=False)
        logw = key - gumbel_from_ids(ids)
        return pa.table({id_col: ids, logw_col: pa.array(logw)})

    return top.map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
