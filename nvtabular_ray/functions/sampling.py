"""Deterministic hash-based sampling / dataset splitting.

A corpus pipeline needs splits that are (a) reproducible across runs and
cluster sizes, (b) stable under data arrival order, and (c) assignable
per-row with no shuffle or global state. Hashing the row key gives all
three: membership is a pure function of the key. Uses the PUBLIC md5_60
spec (functions/hashing.py) so any SQL engine replicates the exact sample:

    DuckDB:  ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT % 10000

The reference has no sampling operator (its only RNG is TargetEncoding's
per-partition fold assignment, /root/reference/nvtabular/ops/
target_encoding.py:427-439, which is partition-count-DEPENDENT — exactly
the trap hash sampling avoids)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_DENOM = 10_000  # basis points: fractions are exact to 0.01%


def _bp(col) -> np.ndarray:
    """md5_60(utf8(key)) % 10000 per row — the public bucket number."""
    import pyarrow.compute as pc

    from nvtabular_ray.functions.hashing import md5_60

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
        col = pc.cast(col, pa.string())
    return (md5_60(col) % np.uint64(_DENOM)).astype(np.int64)


def hash_sample(ds, key_col: str, fraction: float):
    """Keep rows whose key hashes into the first ``fraction`` of bucket
    space. Deterministic, order- and partitioning-invariant; all rows of
    one key are kept or dropped TOGETHER (sample by entity, not by row)."""
    cut = int(round(fraction * _DENOM))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_bp(t.column(key_col)) < cut))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(ds, key_col: str, splits: dict[str, float], out_col: str = "split"):
    """Append a split label ('train'/'valid'/'test'/...) per row from
    consecutive hash-bucket ranges sized by the given fractions (must sum
    to 1.0 within basis-point rounding). Label order = dict order."""
    cuts, acc = [], 0
    for name, frac in splits.items():
        acc += int(round(frac * _DENOM))
        cuts.append((name, acc))
    if cuts[-1][1] != _DENOM:
        raise ValueError(f"split fractions must sum to 1.0 (got {cuts[-1][1]/_DENOM})")
    bounds = np.array([c for _, c in cuts], dtype=np.int64)
    labels = np.array([n for n, _ in cuts], dtype=object)

    def f(t: pa.Table) -> pa.Table:
        bp = _bp(t.column(key_col))
        idx = np.searchsorted(bounds, bp, side="right")
        return t.append_column(out_col, pa.array(labels[idx], pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def corpus_mix(ds, source_col: str, key_col: str, weights: dict[str, float]):
    """Deterministic corpus re-weighting: keep each row with the
    per-source retention fraction ``weights[source]`` (sources absent from
    the dict are dropped; fraction 1.0 keeps everything). Membership is a
    pure function of (source, key) via the public md5 bucket — the standard
    'mix 30% web / 100% books / 10% logs' step of a training-data pipeline,
    reproducible across runs and cluster shapes, no shuffle."""
    cuts = {s: int(round(f * _DENOM)) for s, f in weights.items()}

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bp = _bp(t.column(key_col))
        src = t.column(source_col)
        keep = np.zeros(t.num_rows, dtype=bool)
        for s, cut in cuts.items():
            m = np.asarray(pc.equal(pc.fill_null(src, ""), s))
            keep |= m & (bp < cut)
        return t.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def top_k_per_group(
    ds,
    keys,
    order_col: str,
    k: int,
    descending: bool = True,
    tie_cols=None,
    num_buckets=None,
):
    """Keep the top-``k`` rows of every key group ordered by ``order_col``
    (numeric/timestamp), ties broken by ``tie_cols`` ascending — the
    "best N documents per domain/language" selection step of a corpus
    pipeline. Deterministic when (order_col, *tie_cols) is unique per
    group; SQL analog ``row_number() OVER (PARTITION BY keys ORDER BY
    order_col [DESC], tie_cols) <= k``.

    Scale plan: a PARTIAL top-k inside map_batches first caps every batch
    at k rows per key (the classic combiner — a hot key contributes at
    most k rows per block to the exchange), then ONE bucketed shuffle and
    the same kernel finalizes per entity-complete bucket.
    """
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    keys = [keys] if isinstance(keys, str) else list(keys)
    tie_cols = [tie_cols] if isinstance(tie_cols, str) else list(tie_cols or [])

    def topk_table(t: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.hashing import (
            hash64_columns,
            hash64_columns_stable,
        )

        n = t.num_rows
        if n == 0:
            return t
        kh = hash64_columns(t, keys).astype(np.int64)
        # second INDEPENDENT hash: grouping by one 64-bit hash alone would
        # merge two colliding keys and cap their union at k rows (birthday
        # bound is reachable at design scale); two independent functions
        # push collision odds to ~2^-128
        kh2 = hash64_columns_stable(t, keys).astype(np.int64)
        v = t.column(order_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vv = v.to_numpy(zero_copy_only=False)
        if vv.dtype.kind in "mM":
            vv = vv.view("i8")
        if descending:
            if vv.dtype.kind in "iu":
                # exact descending key for ANY integer: map order-preservingly
                # to uint64 (flip sign bit) then bit-flip — plain negation
                # wraps on unsigned 0 and int64 min
                if vv.dtype.kind == "i":
                    u = vv.astype(np.int64, copy=False).view(np.uint64) ^ np.uint64(1 << 63)
                else:
                    u = vv.astype(np.uint64, copy=False)
                vv = ~u
            else:
                vv = -vv
        ties = []
        for c in reversed(tie_cols):
            ta = t.column(c)
            if isinstance(ta, pa.ChunkedArray):
                ta = ta.combine_chunks()
            tv = ta.to_numpy(zero_copy_only=False)
            ties.append(tv.view("i8") if tv.dtype.kind in "mM" else tv)
        order = np.lexsort((*ties, vv, kh2, kh))
        kh_s, kh2_s = kh[order], kh2[order]
        change = np.r_[True, (kh_s[1:] != kh_s[:-1]) | (kh2_s[1:] != kh2_s[:-1])]
        starts = np.flatnonzero(change)
        counts = np.diff(np.r_[starts, n])
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        return t.take(pa.array(order[rank < k]))

    # partial top-k per block (combiner), then entity-complete final top-k
    pre = ds.map_batches(topk_table, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_group_map(
        pre, keys, [], topk_table, num_buckets=num_buckets, presort=False
    )


def sample_per_group(ds, keys, id_col: str, k: int, num_buckets=None):
    """Deterministic ``k``-row sample of every key group — the eval-set /
    per-domain carving step ("5 documents per language", "100 convs per
    source"). Rows rank by the PUBLIC md5_60 hash of ``id_col`` (a uniform,
    reproducible shuffle order — same sample on any cluster shape or
    arrival order, ties broken by the id itself), and each group keeps its
    ``k`` smallest. The fixed-COUNT complement of :func:`hash_sample`'s
    fixed-fraction semantics; SQL analog::

        row_number() OVER (PARTITION BY keys
                           ORDER BY md5_60(id), id) <= k

    Scale plan is :func:`top_k_per_group`'s: a combiner caps every batch at
    k rows per key before ONE bucketed exchange finalizes per group."""
    import pyarrow.compute as pc

    from nvtabular_ray.functions.hashing import md5_60

    col = "__samp_h__"

    def add_h(t: pa.Table) -> pa.Table:
        c = t.column(id_col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        if not (pa.types.is_string(c.type) or pa.types.is_large_string(c.type)):
            c = pc.cast(c, pa.string())
        return t.append_column(col, pa.array(md5_60(c).astype(np.int64)))

    hds = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(
        hds, keys, col, k, descending=False, tie_cols=[id_col], num_buckets=num_buckets
    )
    return out.map_batches(
        lambda t: t.drop_columns([col]), batch_format="pyarrow", zero_copy_batch=True
    )
