"""Distributed M:N shuffle join: both sides large, one co-bucketed exchange.

The reference only joins against a SMALL external table, broadcast to every
partition (/root/reference/nvtabular/ops/join_external.py:35-221 — warns when
the right side exceeds 3 partitions, :209-221, and left/inner only, :110-111).
Our ``ops.JoinExternal`` keeps that broadcast path (plus semi/anti). This
module is the missing half at 100 TB: when NEITHER side fits in a worker,
hash-partition BOTH sides on the join key with one exchange each and run an
Arrow (acero) hash join per co-bucket.

Plan shape (idiomatic Ray; same raw-task exchange as
``partitioned.bucketed_group_map`` — the Dataset API has no
hash-repartition-by-key, which is exactly where raw tasks are warranted):

    left  -> map_batches(cast keys) -> split_block(hash % B)  \\
                                                               -> join_bucket(b)
    right -> map_batches(cast keys) -> split_block(hash % B)  /

Each side crosses the wire EXACTLY once; the per-bucket join is a single
C++ acero hash join (build on the smaller bucket side). No padded-null
union rides the exchange (contrast ``partitioned.rejoin_by_key``, which
unions both sides into one stream because its 1:1 contract lets the bucket
fn stay a Dataset ``map_groups``): here the two sides stream independently,
so a row ships only its own columns.

Semantics are ANSI SQL: null keys never match (inner drops them, left/full
emit them unmatched, semi drops, anti keeps — acero hash-join parity
verified in tests against DuckDB); duplicate keys multiply (M:N cross-match
per key); full outer coalesces keys under the left names.

Scale notes:
- semi/anti ship ONLY the right key columns, pre-deduplicated per input
  block (map-side combiner) and again inside the bucket — the right payload
  never crosses the wire.
- Per-bucket memory is size/num_buckets per side; the 2 GiB skew warning
  mirrors ``bucketed_group_map``. By default a pathologically hot key lands
  in one bucket; ``skew_threshold=`` opts into hot-PROBE-key salting (probe
  rows of each detected hot key split across private sub-buckets, its build
  rows replicated to all of them — exact for inner/left/semi/anti). For a
  hot SMALL side use ``ops.JoinExternal`` (broadcast) instead.
- At 10^12 rows the exchange streams map-side (blocks split as they
  arrive); only the per-bucket reduce is a barrier, inherent to hashing.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.functions.hashing import hash64_columns
from nvtabular_ray.pipelines.partitioned import _default_num_buckets

_ACERO_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _arrow_schema(ds, side: str):
    """(ds, pa.Schema) with Arrow types guaranteed. Parquet-backed datasets
    are already Arrow; pandas-backed ones (``from_pandas`` with extension
    dtypes) report pandas dtypes from ``schema()``, so route those through a
    no-op pyarrow ``map_batches`` to pin the block format first.

    Zero-row datasets that went through an exchange (``repartition`` etc.)
    have their schema ERASED by Ray (blocks collapse to 0-column placeholder
    tables) — there is nothing to recover, so fail loudly rather than emit a
    wrong-shaped join."""
    sch = ds.schema(fetch_if_missing=True)
    if sch is not None and all(isinstance(t, pa.DataType) for t in sch.types):
        if sch.names:
            return ds, pa.schema(list(zip(sch.names, sch.types)))
        sch = None
    if sch is not None:
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True)
        sch = ds.schema(fetch_if_missing=True)
    if sch is None or not sch.names:
        raise ValueError(
            f"{side} side has no recoverable schema (a zero-row Ray plan "
            "erases it); pass a schema-carrying dataset — e.g. read_parquet "
            "or ray.data.from_arrow(schema.empty_table())"
        )
    return ds, pa.schema(list(zip(sch.names, sch.types)))


def detect_hot_key_hashes(
    ds,
    keys: Union[str, list],
    threshold: int,
    num_buckets: int = 64,
    max_hot_keys: Optional[int] = None,
):
    """Distributed survivor-only hot-key detection: 64-bit key hashes whose
    total row count exceeds ``threshold``. Returns ``(hashes, counts)`` —
    ``hashes`` sorted ``np.uint64``, ``counts`` ``np.int64``.

    Same discipline as ``hot_split._hot_entity_counts``: per-block partial
    counts (``np.unique``) exchange on ``hash % num_buckets`` and the
    ``> threshold`` filter runs INSIDE the reduce, so the driver only ever
    sees the hot survivors — never the full per-key count table (which at
    10^12 rows is itself big data). Working on hashes rather than key values
    keeps the exchange one fixed-width column for any key arity; a 64-bit
    collision only ever adds a key to the hot set (correctness unaffected —
    salting is exact regardless of WHICH keys are treated as hot).

    ``max_hot_keys`` caps the survivor set at the N heaviest hitters —
    applied per reduce bucket FIRST (each bucket ships at most N rows to
    the driver, so a too-low threshold on a high-cardinality key cannot
    flood the collect), then globally. Salting the hottest-N subset is
    still exact; the un-salted near-threshold keys just stay on the plain
    route."""
    import ray

    keys = _as_list(keys)
    ds = ds.select_columns(keys)
    B2 = max(int(num_buckets), 1)
    cap = None if max_hot_keys is None else max(int(max_hot_keys), 1)

    @ray.remote
    def partial_counts(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        h = hash64_columns(block, keys)
        uniq, cnt = np.unique(h, return_counts=True)
        b = (uniq % np.uint64(B2)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        uniq, cnt, b = uniq[order], cnt[order], b[order]
        bounds = np.searchsorted(b, np.arange(B2 + 1))
        out = tuple(
            (uniq[s:e], cnt[s:e]) for s, e in zip(bounds[:-1], bounds[1:])
        )
        # num_returns=1 hands the caller ONE ref to the whole return value,
        # so at B2=1 return the bare pair (the caller re-wraps it)
        return out if B2 > 1 else out[0]

    @ray.remote
    def reduce_bucket(*parts):
        hs = np.concatenate([p[0] for p in parts])
        cs = np.concatenate([p[1] for p in parts])
        if not len(hs):
            return hs, cs
        uniq, inv = np.unique(hs, return_inverse=True)
        tot = np.bincount(inv, weights=cs.astype(np.float64)).astype(np.int64)
        m = tot > threshold
        uniq, tot = uniq[m], tot[m]
        if cap is not None and len(uniq) > cap:
            top = np.argpartition(tot, -cap)[-cap:]
            uniq, tot = uniq[top], tot[top]
        return uniq, tot

    partials = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is not None and meta.num_rows == 0:
                continue
            partials.append(partial_counts.options(num_returns=B2).remote(ref))
    if not partials:
        return np.array([], dtype=np.uint64), np.array([], dtype=np.int64)
    if B2 == 1:  # bare ref per block, resolving to the bare (uniq, cnt) pair
        partials = [(p,) for p in partials]
    pairs = ray.get([reduce_bucket.remote(*[p[b] for p in partials]) for b in range(B2)])
    hashes = np.concatenate([p[0] for p in pairs]).astype(np.uint64)
    counts = np.concatenate([p[1] for p in pairs]).astype(np.int64)
    if cap is not None and len(hashes) > cap:
        top = np.argpartition(counts, -cap)[-cap:]
        hashes, counts = hashes[top], counts[top]
    order = np.argsort(hashes)
    return hashes[order], counts[order]


def shuffle_join(
    left,
    right,
    on: Union[str, list],
    how: str = "inner",
    right_on: Optional[Union[str, list]] = None,
    num_buckets: Optional[int] = None,
    rsuffix: str = "_r",
    skew_threshold: Optional[int] = None,
    analyze_ds=None,
    max_replication: int = 16,
    max_hot_keys: int = 64,
    max_probe_bytes_per_task: Union[int, str, None] = "auto",
):
    """Join two ``ray.data.Dataset``s on key columns with one co-bucketed
    hash exchange per side.

    ``on``/``right_on``: key column names on each side (``right_on``
    defaults to ``on``); right key columns are cast to the left key dtypes
    when they differ (join keys must be comparable). ``how``: ``inner`` /
    ``left`` / ``full`` / ``semi`` / ``anti`` (JoinExternal's surface plus
    full outer; for a right join, swap the sides and use ``left``).
    Output columns: left columns (keys keep LEFT names), then right non-key
    columns — renamed with ``rsuffix`` on a name clash. ``semi``/``anti``
    emit left columns only. ``full`` coalesces the key columns (SQL
    ``COALESCE(l.k, r.rk) AS k`` — acero full-outer parity): a
    right-unmatched row carries its key under the LEFT key name.

    Project each side with ``select_columns`` BEFORE joining — the join
    ships whatever you pass it (prune at the read, SURVEY §7.4.7).

    ``skew_threshold``: opt-in hot-PROBE-key salting. Left keys with more
    than this many rows (found by ``detect_hot_key_hashes`` — a filtered
    count exchange; the driver only sees the hot survivors) are SALTED:
    their probe rows round-robin across ``R = ceil(count/threshold)``
    (capped at ``max_replication``) private sub-buckets and their build
    rows replicate to all R, so no single task holds a hot key's whole
    probe side. Exact for ``inner``/``left``/``semi``/``anti``; rejected
    for ``full`` (a replicated right row unmatched in one sub-bucket but
    matched in another would emit twice). Detection consumes ``left`` once
    more — pass ``analyze_ds`` (the raw pruned source, hot_split's
    ``analyze_ds`` convention) when ``left`` has expensive lazy upstream
    stages. A hot BUILD key is different: its join output is inherently
    huge; broadcast that side (``ops.JoinExternal``) instead.
    ``max_hot_keys`` (default 64) keeps salting a heavy-hitter mechanism:
    only the N hottest survivors get private sub-buckets, so total task
    count stays bounded even when the threshold would qualify thousands of
    keys (the rest take the plain route — still exact, just unsalted).

    ``max_probe_bytes_per_task`` — adaptive probe-chunking, ON by default
    (``"auto"`` = 2 GiB, the same figure as the in-task skew warning).
    The exchange already knows every bucket's probe size (each split task
    returns a tiny per-bucket row-count vector alongside its shards), so
    a bucket whose probe side exceeds the cap is joined by several tasks —
    each takes a subset of the bucket's probe shards plus ALL its build
    shards — with NO detection scan and no re-read of the input. Exactness
    is the same argument as salting (each probe row meets the full build
    side exactly once): exact for ``inner``/``left``/``semi``/``anti``;
    for ``full`` the cap is ignored under ``"auto"`` and rejected when set
    explicitly (a replicated unmatched build row would emit per chunk).
    Chunk granularity is one shard (= one input block's slice), so a
    single block can never be split — per-task probe memory is bounded by
    max(cap, input block size). Sizes are accumulated on the driver in
    O(num_buckets) memory (batched ref gets). Prefer this over
    ``skew_threshold`` unless you need row-granular balance: it costs no
    extra pass, adapts to actual bytes, and composes with salting (salted
    sub-buckets are measured and chunked like any bucket).
    """
    import ray
    import ray.data as rd

    if how not in _ACERO_TYPE:
        raise ValueError(f"how must be one of {sorted(_ACERO_TYPE)}, got {how!r}")
    if max_probe_bytes_per_task == "auto":
        chunk_cap = None if how == "full" else (2 << 30)
    elif max_probe_bytes_per_task is None:
        chunk_cap = None
    else:
        chunk_cap = int(max_probe_bytes_per_task)
        if chunk_cap <= 0:
            raise ValueError(
                f"max_probe_bytes_per_task must be positive, got {max_probe_bytes_per_task}"
            )
        if how == "full":
            raise ValueError(
                "max_probe_bytes_per_task is not supported for how='full': a "
                "build row unmatched in one probe chunk but matched in another "
                "would be emitted twice"
            )
    on = _as_list(on)
    right_on = on if right_on is None else _as_list(right_on)
    if len(on) != len(right_on):
        raise ValueError(f"on ({on}) and right_on ({right_on}) length mismatch")

    left, lschema = _arrow_schema(left, "left")
    right, rschema = _arrow_schema(right, "right")
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    for c in on:
        if c not in ltypes:
            raise KeyError(f"left key column {c!r} not in {lschema.names}")
    for c in right_on:
        if c not in rtypes:
            raise KeyError(f"right key column {c!r} not in {rschema.names}")

    # a key column whose PROBED block was all null reports type `null` (Ray
    # infers the schema from one block); adopt the other side's key type so
    # the hash and the acero join see a concrete type (null casts to
    # anything, stays null — ANSI non-matching is preserved)
    lnull_casts = {
        lc: rtypes[rc]
        for lc, rc in zip(on, right_on)
        if pa.types.is_null(ltypes[lc]) and not pa.types.is_null(rtypes[rc])
    }
    if lnull_casts:
        import pyarrow.compute as pc

        ltypes.update(lnull_casts)

        def cast_left_keys(t: pa.Table) -> pa.Table:
            for c, typ in lnull_casts.items():
                if pa.types.is_null(t.column(c).type):
                    t = t.set_column(
                        t.schema.get_field_index(c), c, pc.cast(t.column(c), typ)
                    )
            return t

        left = left.map_batches(
            cast_left_keys, batch_format="pyarrow", zero_copy_batch=True
        )

    existence = how in ("semi", "anti")
    if existence:
        # the right payload never crosses the wire: keys only, block-deduped
        right = right.select_columns(right_on)
        rpayload: list[str] = []
        out_fields = [(c, ltypes[c]) for c in lschema.names]
    else:
        rpayload = [c for c in rschema.names if c not in right_on]
        clash = set(lschema.names)
        out_fields = [(c, ltypes[c]) for c in lschema.names] + [
            (c + rsuffix if c in clash else c, rtypes[c]) for c in rpayload
        ]
    out_names = [n for n, _ in out_fields]
    out_schema = pa.schema([pa.field(n, t) for n, t in out_fields])

    # align right key dtypes to the left's so the bucket hash and the acero
    # join both see identical types (int32 vs int64 keys would otherwise
    # hash to DIFFERENT buckets: hash64_columns dispatches on physical type)
    key_casts = {
        rc: ltypes[lc] for lc, rc in zip(on, right_on) if rtypes[rc] != ltypes[lc]
    }
    if key_casts:
        import pyarrow.compute as pc

        def cast_keys(t: pa.Table) -> pa.Table:
            for c, typ in key_casts.items():
                t = t.set_column(
                    t.schema.get_field_index(c), c, pc.cast(t.column(c), typ)
                )
            return t

        right = right.map_batches(cast_keys, batch_format="pyarrow", zero_copy_batch=True)

    if existence:

        def distinct_keys(t: pa.Table) -> pa.Table:
            # map-side combiner: one distinct right key per block is enough
            return t.group_by(right_on, use_threads=False).aggregate([])

        right = right.map_batches(distinct_keys, batch_format="pyarrow")

    if num_buckets is None:
        from ray.data.dataset import MaterializedDataset

        sz = None
        if isinstance(left, MaterializedDataset) and isinstance(right, MaterializedDataset):
            sz = left.size_bytes() + right.size_bytes()
        num_buckets = _default_num_buckets(sz)
    # num_returns=1 hands back a bare ref (no tuple to index into)
    num_buckets = max(int(num_buckets), 2)
    B = num_buckets
    join_type = _ACERO_TYPE[how]

    # --- hot-probe-key salting (opt-in) ---------------------------------
    hot_ref = None
    total_buckets = B
    if skew_threshold is not None:
        if how == "full":
            raise ValueError(
                "skew_threshold is not supported for how='full': a replicated "
                "right row unmatched in one sub-bucket but matched in another "
                "would be emitted twice"
            )
        if int(max_replication) < 2:
            # reps=0 would silently DROP every hot-key row (empty repeat on
            # the build side, modulo-zero salt on the probe side)
            raise ValueError(f"max_replication must be >= 2, got {max_replication}")
        hot_h, hot_n = detect_hot_key_hashes(
            left if analyze_ds is None else analyze_ds,
            on,
            int(skew_threshold),
            max_hot_keys=max_hot_keys,
        )
        if len(hot_h):
            reps = np.clip(
                -(-hot_n // int(skew_threshold)), 2, int(max_replication)
            ).astype(np.int64)
            base = np.concatenate([[0], np.cumsum(reps)])[:-1].astype(np.int64)
            total_buckets = B + int(reps.sum())
            hot_ref = ray.put((hot_h, reps, base))
    TB = total_buckets

    @ray.remote
    def split_block(block, keys: list[str], replicate: bool, hot):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        h = hash64_columns(block, keys)
        bucket = (h % np.uint64(B)).astype(np.int64)
        idx = None
        if hot is not None:
            hot_h, reps, base = hot
            p = np.minimum(np.searchsorted(hot_h, h), len(hot_h) - 1)
            is_hot = hot_h[p] == h
            if is_hot.any():
                if replicate:
                    # build side: hot rows go to ALL their R sub-buckets
                    rows = np.where(is_hot)[0]
                    r = reps[p[rows]]
                    rep_rows = np.repeat(rows, r)
                    starts = np.concatenate([[0], np.cumsum(r)])[:-1]
                    off = np.arange(len(rep_rows), dtype=np.int64) - np.repeat(starts, r)
                    rep_bucket = B + np.repeat(base[p[rows]], r) + off
                    keep = np.where(~is_hot)[0]
                    idx = np.concatenate([keep, rep_rows])
                    bucket = np.concatenate([bucket[keep], rep_bucket])
                else:
                    # probe side: hot rows round-robin across their R by
                    # rank WITHIN the key (a global row-position salt
                    # collapses under periodic layouts — e.g. hot rows at
                    # even positions with R=2 all landing in sub-bucket 0)
                    rows = np.where(is_hot)[0]
                    o = np.argsort(p[rows], kind="stable")
                    sp = p[rows][o]
                    run_start = np.r_[0, np.flatnonzero(np.diff(sp)) + 1]
                    run_id = np.zeros(len(sp), dtype=np.int64)
                    run_id[run_start[1:]] = 1
                    rank = np.arange(len(sp), dtype=np.int64) - run_start[
                        np.cumsum(run_id)
                    ]
                    bucket[rows[o]] = B + base[sp] + rank % reps[sp]
        order = np.argsort(bucket, kind="stable")
        srt = block.take(pa.array(order if idx is None else idx[order]))
        bounds = np.searchsorted(bucket[order], np.arange(TB + 1))
        # last return: per-bucket row counts + block bytes/rows, so the
        # driver can chunk oversized buckets WITHOUT touching the shards
        sizes = np.empty(TB + 2, dtype=np.int64)
        sizes[:TB] = np.diff(bounds)
        sizes[TB] = block.nbytes
        sizes[TB + 1] = block.num_rows
        return (
            *(srt.slice(bounds[b], bounds[b + 1] - bounds[b]) for b in range(TB)),
            sizes,
        )

    def stream_splits(ds, keys: list[str], replicate: bool) -> list:
        out = []
        for bundle in ds.iter_internal_ref_bundles():
            for ref, m in bundle.blocks:
                if m.num_rows is not None and m.num_rows == 0:
                    continue
                out.append(
                    split_block.options(num_returns=TB + 1).remote(
                        ref, keys, replicate, hot_ref
                    )
                )
        return out

    empty_out = out_schema.empty_table()

    def _right_only(rt: pa.Table) -> pa.Table:
        # full outer, no probe rows in this bucket: every right row is
        # unmatched — keys coalesce from the right, left payload null-pads
        cols = []
        key_of = dict(zip(on, right_on))
        for c in lschema.names:
            if c in key_of:
                cols.append(rt.column(key_of[c]))
            else:
                cols.append(pa.nulls(rt.num_rows, ltypes[c]))
        for c in rpayload:
            cols.append(rt.column(c))
        return pa.table(cols, schema=out_schema)

    @ray.remote
    def join_bucket(b: int, nl: int, *shards):
        lparts = [s for s in shards[:nl] if s.num_rows]
        rparts = [s for s in shards[nl:] if s.num_rows]
        if not lparts:
            if how == "full" and rparts:
                rt = rparts[0] if len(rparts) == 1 else pa.concat_tables(rparts, promote_options="default")
                return _right_only(rt)
            return empty_out
        lt = lparts[0] if len(lparts) == 1 else pa.concat_tables(lparts, promote_options="default")
        if lt.nbytes > 2 << 30:
            import warnings

            warnings.warn(
                f"join bucket {b} holds {lt.nbytes >> 20} MiB of probe rows in "
                "one task; raise num_buckets to keep per-task memory bounded",
                ResourceWarning,
            )
        if not rparts:
            # no build rows in this bucket: resolvable without a join
            if how in ("inner", "semi"):
                return empty_out
            if how == "anti":
                return lt.select(out_names)
            # left/full outer: null-pad the right payload
            for c, out_name in zip(rpayload, out_names[len(lschema.names):]):
                lt = lt.append_column(out_name, pa.nulls(lt.num_rows, rtypes[c]))
            return lt.select(out_names)
        rt = rparts[0] if len(rparts) == 1 else pa.concat_tables(rparts, promote_options="default")
        if existence and len(rparts) > 1:
            rt = rt.group_by(right_on, use_threads=False).aggregate([])
        out = lt.join(
            rt,
            keys=on,
            right_keys=right_on,
            join_type=join_type,
            right_suffix=rsuffix,
            use_threads=False,
        )
        return out.select(out_names)

    lsplits = stream_splits(left, on, replicate=False)
    rsplits = stream_splits(right, right_on, replicate=True)
    if not lsplits and (how != "full" or not rsplits):
        return rd.from_arrow(empty_out)

    probe_bytes = None
    if chunk_cap is not None and lsplits:
        # O(num_buckets) driver memory: batched gets of the tiny size
        # vectors, accumulated and discarded (this waits on the probe-side
        # split tasks — the per-bucket reduce could not start earlier
        # anyway, hashing's inherent barrier)
        probe_bytes = np.zeros(TB, dtype=np.float64)
        size_refs = [s[TB] for s in lsplits]
        for i in range(0, len(size_refs), 256):
            for v in ray.get(size_refs[i : i + 256]):
                if v[TB + 1] > 0:
                    probe_bytes += v[:TB].astype(np.float64) * (v[TB] / v[TB + 1])

    out_refs = []
    for b in range(TB):
        lrefs = [s[b] for s in lsplits]
        rrefs = [s[b] for s in rsplits]
        n_chunks = 1
        if probe_bytes is not None and probe_bytes[b] > chunk_cap:
            n_chunks = min(int(np.ceil(probe_bytes[b] / chunk_cap)), len(lrefs))
        if n_chunks <= 1:
            out_refs.append(join_bucket.remote(b, len(lrefs), *lrefs, *rrefs))
        else:
            for g in range(n_chunks):
                sub = lrefs[g::n_chunks]
                out_refs.append(join_bucket.remote(b, len(sub), *sub, *rrefs))
    return rd.from_arrow_refs(out_refs)
