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

from nvtabular_ray.arrow_utils import null_safe_group_by
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


def _split_to_buckets(block, keys: list, B: int, TB: int, hot, replicate: bool):
    """Split one block into TB bucket shards by key hash, with optional
    hot-key salting, plus a trailing per-bucket size vector.

    ``hot`` is ``(hot_hashes_sorted, reps, base)`` or None. Probe rows
    (``replicate=False``) of a hot key round-robin across its ``reps[k]``
    private sub-buckets by rank WITHIN the key (a global row-position salt
    collapses under periodic layouts — e.g. hot rows at even positions
    with R=2 all landing in sub-bucket 0); build rows (``replicate=True``)
    copy to ALL of them. Returns ``TB`` tables followed by an int64 vector
    ``[rows_per_bucket..., block_nbytes, block_rows]`` so the driver can
    chunk oversized buckets without touching the shards."""
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
                rows = np.where(is_hot)[0]
                o = np.argsort(p[rows], kind="stable")
                sp = p[rows][o]
                run_start = np.r_[0, np.flatnonzero(np.diff(sp)) + 1]
                run_id = np.zeros(len(sp), dtype=np.int64)
                run_id[run_start[1:]] = 1
                rank = np.arange(len(sp), dtype=np.int64) - run_start[np.cumsum(run_id)]
                # a per-block offset: rank alone restarts at 0 every block,
                # so a hot key with FEWER rows per block than R (one row per
                # time-ordered shard, say) would land every row in
                # sub-bucket base+0. Mixing the block's own hashes spreads
                # thin-per-block hot keys across blocks while keeping the
                # within-block round-robin exact and deterministic.
                blk_off = np.int64(
                    (int(h[0]) ^ (int(h[-1]) >> 1) ^ len(h)) & 0x7FFFFFFF
                )
                bucket[rows[o]] = B + base[sp] + (rank + blk_off) % reps[sp]
    order = np.argsort(bucket, kind="stable")
    srt = block.take(pa.array(order if idx is None else idx[order]))
    bounds = np.searchsorted(bucket[order], np.arange(TB + 1))
    sizes = np.empty(TB + 2, dtype=np.int64)
    sizes[:TB] = np.diff(bounds)
    sizes[TB] = block.nbytes
    sizes[TB + 1] = block.num_rows
    return (
        *(srt.slice(bounds[b], bounds[b + 1] - bounds[b]) for b in range(TB)),
        sizes,
    )


def _adopt_null_key_types(ds, casts: dict):
    """A key column probed as all-null (Ray one-block schema inference)
    adopts the other side's concrete type: null casts to anything and stays
    null, so ANSI non-matching is preserved while the hash and acero see a
    real type. The per-batch re-check matters — later blocks may already
    carry the concrete type."""
    import pyarrow.compute as pc

    def cast_left_keys(t: pa.Table) -> pa.Table:
        for c, typ in casts.items():
            if pa.types.is_null(t.column(c).type):
                t = t.set_column(
                    t.schema.get_field_index(c), c, pc.cast(t.column(c), typ)
                )
        return t

    return ds.map_batches(cast_left_keys, batch_format="pyarrow", zero_copy_batch=True)


def _concrete_key_cols(t: pa.Table, keys: list, types: dict) -> pa.Table:
    """Even when the dataset-level schema probed a concrete key type, an
    individual BLOCK whose key column is all null carries Arrow type `null`
    (Ray infers block schemas independently, e.g. after a repartition); a
    bucket assembled only from such blocks hands acero a null-typed join
    key, which it rejects. Cast those columns to the planned type — values
    stay null, so ANSI non-matching is unchanged."""
    import pyarrow.compute as pc

    for c in keys:
        typ = types[c]
        col = t.column(c)
        if pa.types.is_null(col.type) and not pa.types.is_null(typ):
            t = t.set_column(t.schema.get_field_index(c), c, pc.cast(col, typ))
    return t


def _check_unique_names(out_names: list, rsuffix: str):
    """Acero's ``right_suffix`` renames only right columns clashing with the
    LEFT table, so a right side carrying both ``x`` and a literal ``x_r``
    (left has ``x``) emits two ``x_r`` columns and the final ``select``
    dies with a KeyError inside the remote task. Refuse at plan time."""
    seen, dups = set(), []
    for n in out_names:
        if n in seen:
            dups.append(n)
        seen.add(n)
    if dups:
        raise ValueError(
            f"join output column names collide after suffixing: {sorted(set(dups))}; "
            f"rename the clashing right columns or pass a different rsuffix "
            f"(current: {rsuffix!r})"
        )


def _make_stream_splits(split_block, TB: int):
    """Shared probe/build split driver: one split task per non-empty input
    block, each returning TB shards + the trailing size vector."""

    def stream_splits(ds, keys: list, replicate: bool, hot_ref) -> list:
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

    return stream_splits


def _warn_fat_bucket(b: int, nbytes: int):
    if nbytes > 2 << 30:
        import warnings

        warnings.warn(
            f"join bucket {b} holds {nbytes >> 20} MiB of probe rows in "
            "one task; raise num_buckets to keep per-task memory bounded",
            ResourceWarning,
        )


def _warn_fat_build(b: int, nbytes: int):
    # probe-chunking cannot shrink the BUILD side (it replicates per chunk);
    # a hot build key needs the broadcast join instead
    if nbytes > 2 << 30:
        import warnings

        warnings.warn(
            f"join bucket {b} holds {nbytes >> 20} MiB of BUILD rows in one "
            "task; probe-chunking/salting cannot reduce this — if one key "
            "dominates the build side, broadcast that side (ops.JoinExternal) "
            "or raise num_buckets",
            ResourceWarning,
        )


def _pack_shards(sizes: np.ndarray, cap: float) -> list:
    """Greedy LPT byte-aware packing: assign shards (descending size) to the
    lightest group, opening a new group while the lightest is full. Bounds
    every group at ~cap + one shard — a strided ``refs[g::G]`` split is
    byte-blind and can stack all the big shards of an alternating
    big/small layout into one group. Returns a list of index lists."""
    order = [i for i in np.argsort(sizes)[::-1] if sizes[i] > 0]
    groups, loads = [], []
    for i in order:
        g = int(np.argmin(loads)) if loads else -1
        if g < 0 or (loads[g] + sizes[i] > cap and loads[g] > 0):
            groups.append([int(i)])
            loads.append(float(sizes[i]))
        else:
            groups[g].append(int(i))
            loads[g] += float(sizes[i])
    return groups


def _resolve_chunk_cap(max_probe_bytes_per_task, how: str):
    if max_probe_bytes_per_task == "auto":
        return None if how == "full" else (2 << 30)
    if max_probe_bytes_per_task is None:
        return None
    cap = int(max_probe_bytes_per_task)
    if cap <= 0:
        raise ValueError(
            f"max_probe_bytes_per_task must be positive, got {max_probe_bytes_per_task}"
        )
    if how == "full":
        raise ValueError(
            "max_probe_bytes_per_task is not supported for how='full': a "
            "build row unmatched in one probe chunk but matched in another "
            "would be emitted twice"
        )
    return cap


def _plan_salting(
    ray, probe_ds, on, skew_threshold, max_replication, max_hot_keys, B,
    key_types=None,
):
    """Returns ``(hot_ref, TB)`` — the broadcast salting plan and the total
    bucket count (B plus every hot key's private sub-buckets)."""
    if int(max_replication) < 2:
        # reps=0 would silently DROP every hot-key row (empty repeat on
        # the build side, modulo-zero salt on the probe side)
        raise ValueError(f"max_replication must be >= 2, got {max_replication}")
    if int(skew_threshold) < 1:
        # threshold 0 would ceil-divide by zero (numpy warns and yields 0)
        raise ValueError(f"skew_threshold must be >= 1, got {skew_threshold}")
    hot_h, hot_n = detect_hot_key_hashes(
        probe_ds, on, int(skew_threshold), max_hot_keys=max_hot_keys,
        key_types=key_types,
    )
    if not len(hot_h):
        return None, B
    reps = np.clip(
        -(-hot_n // int(skew_threshold)), 2, int(max_replication)
    ).astype(np.int64)
    base = np.concatenate([[0], np.cumsum(reps)])[:-1].astype(np.int64)
    return ray.put((hot_h, reps, base)), B + int(reps.sum())


def _plan_probe_chunks(ray, lsplits, TB: int, cap: float) -> dict:
    """Byte-aware chunk plan for oversized buckets: ``{bucket: [shard-index
    lists]}`` (absent = one task). Two passes over the tiny per-block size
    vectors, batched gets: totals first (O(num_buckets) driver memory),
    then per-shard bytes ONLY for the buckets past the cap
    (O(blocks × oversized buckets)), greedy-LPT packed so no task exceeds
    ~cap + one shard. This waits on the probe-side split tasks — the
    per-bucket reduce could not start earlier anyway, hashing's inherent
    barrier WITHIN one join (note: it does serialize the driver across
    independent joins submitted back-to-back; pass
    ``max_probe_bytes_per_task=None`` to opt out)."""
    size_refs = [s[TB] for s in lsplits]
    totals = np.zeros(TB, dtype=np.float64)
    widths = np.zeros(len(size_refs), dtype=np.float64)  # bytes/row per block
    for i in range(0, len(size_refs), 256):
        for j, v in enumerate(ray.get(size_refs[i : i + 256])):
            if v[TB + 1] > 0:
                widths[i + j] = v[TB] / v[TB + 1]
                totals += v[:TB].astype(np.float64) * widths[i + j]
    hot = np.flatnonzero(totals > cap)
    chunks: dict = {}
    if len(hot):
        per = np.zeros((len(size_refs), len(hot)), dtype=np.float64)
        for i in range(0, len(size_refs), 256):
            for j, v in enumerate(ray.get(size_refs[i : i + 256])):
                per[i + j] = v[hot].astype(np.float64) * widths[i + j]
        for k, b in enumerate(hot):
            groups = _pack_shards(per[:, k], float(cap))
            if len(groups) > 1:  # a single giant shard cannot be split
                chunks[int(b)] = groups
    return chunks


def detect_hot_key_hashes(
    ds,
    keys: Union[str, list],
    threshold: int,
    num_buckets: int = 64,
    max_hot_keys: Optional[int] = None,
    key_types: Optional[list] = None,
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
    route.

    ``key_types``: expected Arrow types for ``keys`` in order (the PROBE
    side's types). ``hash64_columns`` dispatches on physical type, so an
    ``analyze_ds`` whose key is int32 while the probe carries int64 would
    otherwise produce hashes that never match anything — salting would
    silently no-op. Columns are cast before hashing when they differ."""
    import ray

    keys = _as_list(keys)
    ds = ds.select_columns(keys)
    B2 = max(int(num_buckets), 1)
    cap = None if max_hot_keys is None else max(int(max_hot_keys), 1)

    @ray.remote
    def partial_counts(block):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if key_types is not None:
            import pyarrow.compute as pc

            for c, typ in zip(keys, key_types):
                if block.column(c).type != typ:
                    block = block.set_column(
                        block.schema.get_field_index(c), c,
                        pc.cast(block.column(c), typ),
                    )
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
    single block can never be split — oversized buckets are greedy-LPT
    packed by estimated bytes, bounding per-task probe memory at ~cap +
    one block. Sizes are accumulated on the driver in O(num_buckets)
    memory (batched ref gets). Prefer this over ``skew_threshold`` unless
    you need row-granular balance: it costs no extra pass, adapts to
    actual bytes, and composes with salting (salted sub-buckets are
    measured and chunked like any bucket). Caveat: the size collect
    blocks the CALLING driver thread until the probe side is split —
    within one join that barrier is inherent (the reduce needs every map
    anyway), but if you submit several independent joins back-to-back and
    want their exchanges to overlap, pass ``None`` here.
    """
    import ray
    import ray.data as rd

    if how not in _ACERO_TYPE:
        raise ValueError(f"how must be one of {sorted(_ACERO_TYPE)}, got {how!r}")
    chunk_cap = _resolve_chunk_cap(max_probe_bytes_per_task, how)
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
        ltypes.update(lnull_casts)
        left = _adopt_null_key_types(left, lnull_casts)

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
    _check_unique_names(out_names, rsuffix)
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
            # map-side combiner: one distinct right key per block is enough.
            # null-safe: pyarrow 16.1 multi-key group_by duplicates null-key
            # rows; harmless for join semantics (null keys never match) but
            # the helper keeps the build side minimal (arrow_utils docstring)
            return null_safe_group_by(t, right_on, [])

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
    hot_ref, TB = None, B
    if skew_threshold is not None:
        if how == "full":
            raise ValueError(
                "skew_threshold is not supported for how='full': a replicated "
                "right row unmatched in one sub-bucket but matched in another "
                "would be emitted twice"
            )
        hot_ref, TB = _plan_salting(
            ray,
            left if analyze_ds is None else analyze_ds,
            on,
            skew_threshold,
            max_replication,
            max_hot_keys,
            B,
            key_types=[ltypes[c] for c in on],
        )

    @ray.remote
    def split_block(block, keys: list[str], replicate: bool, hot):
        return _split_to_buckets(block, keys, B, TB, hot, replicate)

    stream_splits = _make_stream_splits(split_block, TB)

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
                return _right_only(_concrete_key_cols(rt, right_on, rtypes))
            return empty_out
        lt = lparts[0] if len(lparts) == 1 else pa.concat_tables(lparts, promote_options="default")
        lt = _concrete_key_cols(lt, on, ltypes)
        _warn_fat_bucket(b, lt.nbytes)
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
        rt = _concrete_key_cols(rt, right_on, rtypes)
        if existence and len(rparts) > 1:
            rt = null_safe_group_by(rt, right_on, [])  # null-safe multi-key distinct
        _warn_fat_build(b, rt.nbytes)
        out = lt.join(
            rt,
            keys=on,
            right_keys=right_on,
            join_type=join_type,
            right_suffix=rsuffix,
            use_threads=False,
        )
        return out.select(out_names)

    lsplits = stream_splits(left, on, replicate=False, hot_ref=hot_ref)
    rsplits = stream_splits(right, right_on, replicate=True, hot_ref=hot_ref)
    if not lsplits and (how != "full" or not rsplits):
        return rd.from_arrow(empty_out)

    chunks = {}
    if chunk_cap is not None and lsplits:
        chunks = _plan_probe_chunks(ray, lsplits, TB, chunk_cap)

    out_refs = []
    for b in range(TB):
        lrefs = [s[b] for s in lsplits]
        rrefs = [s[b] for s in rsplits]
        groups = chunks.get(b)
        if not groups:
            out_refs.append(join_bucket.remote(b, len(lrefs), *lrefs, *rrefs))
        else:
            for idxs in groups:
                sub = [lrefs[i] for i in idxs]
                out_refs.append(join_bucket.remote(b, len(sub), *sub, *rrefs))
    return rd.from_arrow_refs(out_refs)


def shuffle_join_chain(
    left,
    rights,
    on: Union[str, list],
    num_buckets: Optional[int] = None,
    rsuffix: str = "_r",
    skew_threshold: Optional[int] = None,
    analyze_ds=None,
    max_replication: int = 16,
    max_hot_keys: int = 64,
    max_probe_bytes_per_task: Union[int, str, None] = "auto",
):
    """Join one probe side against SEVERAL build sides that share its key,
    with ONE probe exchange total.

    ``rights``: a list of ``(right_ds, right_on)`` / ``(right_ds,
    right_on, how)`` tuples or dicts with keys ``right``, ``right_on``,
    ``how`` (default ``"inner"``), ``rsuffix`` (default the global one).
    Each step's ``how`` may be ``inner``/``left``/``semi``/``anti``
    (``full`` is unsupported — the probe side of a chain must survive
    unchanged through unmatched steps). All ``right_on`` key lists must
    have the same arity as ``on`` and are cast to the left key dtypes.

    Why this exists: ``A.join(B).join(C)`` as two ``shuffle_join`` calls
    re-exchanges the (largest) intermediate A⋈B a second time. When B and
    C both key on the SAME left column — the fact-table enrichment shape:
    header lookup + per-key stats + eligibility filters — every join is
    bucket-aligned under one hash, so a single task can run the whole
    per-bucket chain: split A once, split each right once, then
    sequential acero joins inside the bucket task. Exchange bytes drop
    from 2·|A⋈B|+|A|+|B|+|C| to |A|+|B|+|C|; no intermediate ever
    re-enters the object store.

    Output columns: left columns, then each step's non-key payload in
    order (suffixed with that step's ``rsuffix`` on a clash with any
    earlier name; ``semi``/``anti`` steps add nothing). Hot-probe-key
    salting (``skew_threshold``, detection on the RAW probe side) and
    adaptive probe-chunking (``max_probe_bytes_per_task``) work exactly
    as in ``shuffle_join`` — both are exact here because every step is
    probe-preserving: a probe row meets every build side in full, once.
    """
    import ray
    import ray.data as rd

    on = _as_list(on)
    if not rights:
        raise ValueError("rights must be a non-empty list")
    steps = []
    for i, spec in enumerate(rights):
        if isinstance(spec, dict):
            unknown = set(spec) - {"right", "right_on", "how", "rsuffix"}
            if unknown:
                # a typo ('hw' for 'how') must not silently run an inner join
                raise ValueError(f"rights[{i}]: unknown spec keys {sorted(unknown)}")
            r_ds = spec["right"]
            r_on = spec.get("right_on", on)
            r_how = spec.get("how", "inner")
            r_sfx = spec.get("rsuffix", rsuffix)
        else:
            spec = tuple(spec)
            if not 1 <= len(spec) <= 3:
                raise ValueError(
                    f"rights[{i}]: expected (right, right_on[, how]), got "
                    f"{len(spec)} elements"
                )
            r_ds, r_on = spec[0], spec[1] if len(spec) > 1 and spec[1] is not None else on
            r_how = spec[2] if len(spec) > 2 else "inner"
            r_sfx = rsuffix
        if r_how not in ("inner", "left", "semi", "anti"):
            raise ValueError(
                f"rights[{i}]: how must be inner/left/semi/anti, got {r_how!r}"
            )
        r_on = _as_list(r_on)
        if len(r_on) != len(on):
            raise ValueError(f"rights[{i}]: right_on {r_on} arity != on {on}")
        steps.append({"ds": r_ds, "on": r_on, "how": r_how, "sfx": r_sfx})

    chunk_cap = _resolve_chunk_cap(max_probe_bytes_per_task, "inner")

    left, lschema = _arrow_schema(left, "left")
    ltypes = dict(zip(lschema.names, lschema.types))
    for c in on:
        if c not in ltypes:
            raise KeyError(f"left key column {c!r} not in {lschema.names}")

    import pyarrow.compute as pc

    for i, st in enumerate(steps):
        st["ds"], rschema = _arrow_schema(st["ds"], f"rights[{i}]")
        st["types"] = dict(zip(rschema.names, rschema.types))
        for c in st["on"]:
            if c not in st["types"]:
                raise KeyError(f"rights[{i}] key column {c!r} not in {rschema.names}")
        st["names"] = list(rschema.names)

    # a left key probed as all-null adopts the first concrete right type
    lnull_casts = {}
    for k, lc in enumerate(on):
        if pa.types.is_null(ltypes[lc]):
            for st in steps:
                rt = st["types"][st["on"][k]]
                if not pa.types.is_null(rt):
                    lnull_casts[lc] = rt
                    break
    if lnull_casts:
        ltypes.update(lnull_casts)
        left = _adopt_null_key_types(left, lnull_casts)

    # accumulated output schema + per-step plan
    out_fields = [(c, ltypes[c]) for c in lschema.names]
    seen = set(lschema.names)
    for i, st in enumerate(steps):
        if st["how"] in ("semi", "anti"):
            st["ds"] = st["ds"].select_columns(st["on"])
            st["payload"], st["out_cols"] = [], []
            continue
        st["payload"] = [c for c in st["names"] if c not in st["on"]]
        st["out_cols"] = []
        # mirror acero exactly: a right column is suffixed iff its ORIGINAL
        # name clashes with the left table AT JOIN TIME (left + previous
        # steps' additions) — same-step siblings are not in lt yet, so a
        # sibling-aware planner would diverge from what acero emits
        clash = set(seen)
        for c in st["payload"]:
            name = c + st["sfx"] if c in clash else c
            if name in seen:
                raise ValueError(
                    f"rights[{i}] column {c!r} collides as {name!r}; give this "
                    "step a distinct rsuffix or rename the clashing column"
                )
            seen.add(name)
            st["out_cols"].append(name)
            out_fields.append((name, st["types"][c]))
    out_names = [n for n, _ in out_fields]
    out_schema = pa.schema([pa.field(n, t) for n, t in out_fields])

    # align every right's key dtypes to the left's
    for i, st in enumerate(steps):
        casts = {
            rc: ltypes[lc]
            for lc, rc in zip(on, st["on"])
            if st["types"][rc] != ltypes[lc]
        }
        if casts:

            def cast_keys(t: pa.Table, _casts=casts) -> pa.Table:
                for c, typ in _casts.items():
                    t = t.set_column(
                        t.schema.get_field_index(c), c, pc.cast(t.column(c), typ)
                    )
                return t

            st["ds"] = st["ds"].map_batches(
                cast_keys, batch_format="pyarrow", zero_copy_batch=True
            )
        if st["how"] in ("semi", "anti"):

            def distinct_keys(t: pa.Table, _on=tuple(st["on"])) -> pa.Table:
                # null-safe multi-key distinct (arrow_utils.null_safe_group_by)
                return null_safe_group_by(t, list(_on), [])

            st["ds"] = st["ds"].map_batches(distinct_keys, batch_format="pyarrow")

    if num_buckets is None:
        num_buckets = _default_num_buckets(None)
    num_buckets = max(int(num_buckets), 2)
    B = num_buckets

    hot_ref, TB = None, B
    if skew_threshold is not None:
        hot_ref, TB = _plan_salting(
            ray,
            left if analyze_ds is None else analyze_ds,
            on,
            skew_threshold,
            max_replication,
            max_hot_keys,
            B,
            key_types=[ltypes[c] for c in on],
        )

    @ray.remote
    def split_block(block, keys: list, replicate: bool, hot):
        return _split_to_buckets(block, keys, B, TB, hot, replicate)

    stream_splits = _make_stream_splits(split_block, TB)

    empty_out = out_schema.empty_table()
    plan = [
        (st["on"], _ACERO_TYPE[st["how"]], st["how"], st["sfx"],
         st["out_cols"], [st["types"][c] for c in st["payload"]])
        for st in steps
    ]

    @ray.remote
    def join_bucket(b: int, counts: tuple, *shards):
        nl = counts[0]
        lparts = [s for s in shards[:nl] if s.num_rows]
        if not lparts:
            return empty_out
        lt = (
            lparts[0]
            if len(lparts) == 1
            else pa.concat_tables(lparts, promote_options="default")
        )
        lt = _concrete_key_cols(lt, on, ltypes)
        _warn_fat_bucket(b, lt.nbytes)
        pos = nl
        for (s_on, s_type, s_how, s_sfx, s_cols, s_types), c in zip(
            plan, counts[1:]
        ):
            rparts = [s for s in shards[pos : pos + c] if s.num_rows]
            pos += c
            if not rparts:
                if s_how in ("inner", "semi"):
                    return empty_out
                if s_how == "anti":
                    continue
                for name, typ in zip(s_cols, s_types):  # left: null-pad
                    lt = lt.append_column(name, pa.nulls(lt.num_rows, typ))
                continue
            rt = (
                rparts[0]
                if len(rparts) == 1
                else pa.concat_tables(rparts, promote_options="default")
            )
            rt = _concrete_key_cols(
                rt, s_on, {rc: ltypes[lc] for lc, rc in zip(on, s_on)}
            )
            if s_how in ("semi", "anti") and len(rparts) > 1:
                rt = null_safe_group_by(rt, s_on, [])  # null-safe multi-key distinct
            _warn_fat_build(b, rt.nbytes)
            lt = lt.join(
                rt,
                keys=on,
                right_keys=s_on,
                join_type=s_type,
                right_suffix=s_sfx,
                use_threads=False,
            )
            if not lt.num_rows and s_how in ("inner", "semi"):
                return empty_out
        return lt.select(out_names)

    lsplits = stream_splits(left, on, replicate=False, hot_ref=hot_ref)
    if not lsplits:
        return rd.from_arrow(empty_out)
    rsplits = [
        stream_splits(st["ds"], st["on"], replicate=True, hot_ref=hot_ref)
        for st in steps
    ]

    chunks = {}
    if chunk_cap is not None:
        chunks = _plan_probe_chunks(ray, lsplits, TB, chunk_cap)

    out_refs = []
    for b in range(TB):
        lrefs = [s[b] for s in lsplits]
        rrefs_flat, counts_r = [], []
        for rs in rsplits:
            rb = [s[b] for s in rs]
            rrefs_flat.extend(rb)
            counts_r.append(len(rb))
        groups = chunks.get(b)
        if not groups:
            out_refs.append(
                join_bucket.remote(b, (len(lrefs), *counts_r), *lrefs, *rrefs_flat)
            )
        else:
            for idxs in groups:
                sub = [lrefs[i] for i in idxs]
                out_refs.append(
                    join_bucket.remote(b, (len(sub), *counts_r), *sub, *rrefs_flat)
                )
    return rd.from_arrow_refs(out_refs)
