"""Point-in-time / ordered feature engine: as-of join, sessionize, rolling
windows, backfill. NEW SCOPE mandated by the north rule (BASELINE.json) — the
reference has no as-of/range join (SURVEY.md §2.3 joins row); its nearest
semantics are TargetEncoding's leakage avoidance and DifferenceLag ordering.

All functions share one physical pattern (pipelines/partitioned.py): hash-
bucket the entity key -> ONE Ray shuffle -> per-bucket vectorized pandas over
entity-complete, time-sorted rows. Temporal correctness is by construction:
a feature at (key, t) is computed only from rows of that key with ts <= t
(strictly < t where noted), so there is zero leakage from the future.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.pipelines.partitioned import bucketed_group_map

_SIDE = "__side__"


def _via_hot_split(
    ds, keys, ts_col, specs, rename_map, hot_threshold, target_seg_rows,
    num_buckets, analyze_ds=None, sort_cols=None,
):
    """Route an ordered-feature call through hot-entity splitting
    (pipelines/hot_split.py): entities above ``hot_threshold`` rows are
    segmented with halo+carry exactness instead of landing whole in one
    bucket. Shared by the ``hot_threshold=`` option of sessionize /
    windowed_agg / expanding_agg / backfill."""
    if len(keys) != 1:
        raise ValueError("hot_threshold requires a single-column entity key")
    from nvtabular_ray.pipelines.hot_split import ordered_features

    out = ordered_features(
        ds, keys[0], ts_col, specs,
        hot_threshold=hot_threshold, target_seg_rows=target_seg_rows,
        num_buckets=num_buckets, analyze_ds=analyze_ds, sort_cols=sort_cols,
    )
    if rename_map:
        def ren(t: pa.Table) -> pa.Table:
            return t.rename_columns([rename_map.get(c, c) for c in t.column_names])

        out = out.map_batches(ren, batch_format="pyarrow", zero_copy_batch=True)
    return out


def sessionize(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    gap,
    out_col: str = "session_id",
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Assign 0-based session indices per entity: a new session starts when
    the time since the previous row of the same entity exceeds ``gap``
    (seconds or pd.Timedelta). Rows keep all input columns + ``out_col``.

    ``hot_threshold``: optional skew guard — entities above that many rows
    are time-segmented (hot_split.py halo+carry, exact) instead of landing
    whole in one bucket.
    """
    keys = [key] if isinstance(key, str) else list(key)
    gap_s = gap.total_seconds() if isinstance(gap, pd.Timedelta) else gap
    if hot_threshold is not None:
        return _via_hot_split(
            ds, keys, ts_col,
            [{"kind": "sessionize", "gap": gap_s, "out": out_col}],
            None, hot_threshold, target_seg_rows, num_buckets,
        )

    from nvtabular_ray.ops.temporal_ops import Sessionize

    op = Sessionize(keys, ts_col, gap_s, out_col=out_col)

    def per_bucket(t: pa.Table) -> pa.Table:
        from nvtabular_ray.selector import ColumnSelector

        sid = op.transform(ColumnSelector([ts_col]), t)
        return t.append_column(out_col, sid.column(out_col))

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


def _union_sides(left_ds, right_ds, keys, left_ts, right_ts, right_cols, suffix):
    """Shared two-sided join plumbing (asof_join / range_join): pad both
    sides to one schema with a side tag + common ``__ts__`` axis, union them
    so ONE hash-bucket shuffle moves both sides together.

    Returns ``(both, out_fields, val_cols, union_schema)``: the union
    Dataset, the fixed output (name, arrow_type) list, the right-value
    output names, and the union's arrow schema (computed up front — a
    union of empty inputs reports ``schema() is None``, so downstream
    consumers must not re-derive it from the dataset). Output schema is
    fixed up front so unmatched right values stay their Arrow type
    (nulls), never drifting to float64."""
    from nvtabular_ray.arrow_utils import dataset_arrow_schema

    left_schema = dataset_arrow_schema(left_ds)
    right_schema = dataset_arrow_schema(right_ds)
    left_cols = list(left_schema.names)
    r_cols = right_cols or [c for c in right_schema.names if c not in keys and c != right_ts]

    # resolve output names for right value columns (suffix on collision)
    out_name = {c: (c + suffix if c in left_cols else c) for c in r_cols}

    right_types = {f.name: f.type for f in right_schema}
    left_types = {f.name: f.type for f in left_schema}
    ts_type = left_types[left_ts]

    def pad_left(t: pa.Table) -> pa.Table:
        t = t.append_column(_SIDE, pa.array(np.zeros(t.num_rows, np.int8)))
        t = t.append_column("__ts__", t.column(left_ts).cast(ts_type))
        for c in r_cols:
            t = t.append_column(out_name[c], pa.nulls(t.num_rows, right_types[c]))
        return t

    def pad_right(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        cols["__ts__"] = t.column(right_ts).cast(ts_type)
        for c in r_cols:
            cols[out_name[c]] = t.column(c)
        out = pa.table(cols)
        out = out.append_column(_SIDE, pa.array(np.ones(out.num_rows, np.int8)))
        for c in left_cols:
            if c not in out.column_names:
                out = out.append_column(c, pa.nulls(out.num_rows, left_types[c]))
        return out

    l_pad = left_ds.map_batches(pad_left, batch_format="pyarrow", zero_copy_batch=True)
    r_pad = right_ds.map_batches(pad_right, batch_format="pyarrow", zero_copy_batch=True)
    # align column order for union
    order = left_cols + ["__ts__", _SIDE] + [out_name[c] for c in r_cols]
    both = l_pad.select_columns(order).union(r_pad.select_columns(order))

    val_cols = [out_name[c] for c in r_cols]
    out_fields = [(c, left_types[c]) for c in left_cols] + [
        (out_name[c], right_types[c]) for c in r_cols
    ]
    union_schema = pa.schema(
        [pa.field(c, left_types[c]) for c in left_cols]
        + [pa.field("__ts__", ts_type), pa.field(_SIDE, pa.int8())]
        + [pa.field(out_name[c], right_types[c]) for c in r_cols]
    )
    return both, out_fields, val_cols, union_schema


def asof_join(
    left_ds,
    right_ds,
    key: Union[str, list[str]],
    left_ts: str,
    right_ts: Optional[str] = None,
    right_cols: Optional[list[str]] = None,
    strict: bool = False,
    suffix: str = "_asof",
    num_buckets: Optional[int] = None,
    direction: str = "backward",
    tolerance=None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Point-in-time as-of join: for every left row, attach one right row of
    the same key selected by ``direction`` (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): LATEST right with ``right_ts <= left_ts``
      (``<`` when ``strict=True`` — use strict for feature tables derived
      from the same events to exclude the current instant);
    - ``"forward"``: EARLIEST right with ``right_ts >= left_ts`` (``>``
      when strict);
    - ``"nearest"``: smaller ``|left_ts - right_ts|`` of the two
      candidates, ties resolved backward.

    ``tolerance`` (a ``pd.Timedelta``-convertible for timestamp keys, a
    number for numeric keys) drops matches farther than that from the left
    timestamp. Left rows keep all columns; unmatched rows get nulls. Rough
    SQL analog: DuckDB ``ASOF LEFT JOIN`` (backward; other directions /
    tolerance need a correlated subquery).

    Physical plan: pad both sides to a common schema with a side tag, union,
    hash-bucket by key (ONE shuffle moves both sides together), then per
    bucket a vectorized last/next-seen-right scan over key/time-sorted rows.
    No driver materialization; both sides stream.

    ``hot_threshold``: optional skew guard — keys whose COMBINED (left +
    right) row count exceeds it are split into ~``target_seg_rows`` time
    segments; exactness is preserved by injecting each segment's carry-in
    boundary right rows (the latest right row before the segment for
    backward, the earliest after for forward, both for nearest) into the
    segment's scan. Per-task memory is then capped regardless of the
    hottest key's size.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    right_ts = right_ts or left_ts
    both, out_fields, val_cols, union_schema = _union_sides(
        left_ds, right_ds, keys, left_ts, right_ts, right_cols, suffix
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        # vectorized last-seen-right scan (replaces a pandas merge_asof
        # round-trip): sort the UNION by (key, ts, side) — at equal ts the
        # right row sorts before the left row iff exact matches are allowed —
        # then one maximum.accumulate carries each right row's index forward,
        # reset at key-group boundaries, and a single take gathers the
        # matched right values. Forward direction is the same scan on
        # negated time; nearest combines both by |delta|. No pandas copy;
        # dtypes exact by construction.
        from nvtabular_ray.functions.hashing import hash64_columns

        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        ts = t.column("__ts__").to_numpy(zero_copy_only=False)
        ts_num = ts.view("i8") if ts.dtype.kind in "mM" else ts
        if tolerance is None:
            tol_num = None
        elif ts.dtype.kind == "M":
            unit = np.datetime_data(ts.dtype)[0]
            tol_num = float(
                pd.Timedelta(tolerance)
                .to_timedelta64()
                .astype(f"timedelta64[{unit}]")
                .view("i8")
            )
        else:
            tol_num = float(tolerance)
        # keys may be strings: group identity via the same 64-bit hash the
        # exchange used (collision within one bucket is negligible and the
        # bucket already holds only whole key groups)
        kh = hash64_columns(t, keys).astype(np.int64)
        n = t.num_rows

        def scan(sign: int) -> tuple[np.ndarray, np.ndarray]:
            """(match, ok) in ORIGINAL row coordinates: for each row, the
            original index of its backward (sign=+1) / forward (sign=-1)
            right match and whether one exists in its key group."""
            if n == 0:
                return np.full(0, -1, np.int64), np.zeros(0, bool)
            # tie-break: allow_exact -> right (1) before left (0) at equal ts
            tie = side if strict else -side
            # among fully-equal (key, ts, side) right rows the accumulate
            # lands on the LAST row in scan order; merge_asof picks the last
            # original right row backward (lexsort stability already gives
            # that) but the FIRST forward, so only the forward scan pays an
            # extra lowest-priority key reversing original order
            if sign > 0:
                order = np.lexsort((tie, ts_num, kh))
            else:
                order = np.lexsort((-np.arange(n), tie, -ts_num, kh))
            side_s, kh_s = side[order], kh[order]
            change = np.r_[True, kh_s[1:] != kh_s[:-1]]
            starts = np.flatnonzero(change)
            grp_start = np.repeat(starts, np.diff(np.r_[starts, n]))
            src = np.where(side_s == 1, np.arange(n), -1)
            last_right = np.maximum.accumulate(src)
            matched_s = last_right >= grp_start
            r_orig_s = order[np.maximum(last_right, 0)]
            match = np.full(n, -1, np.int64)
            ok = np.zeros(n, bool)
            match[order] = r_orig_s
            ok[order] = matched_s
            return match, ok

        if direction == "backward":
            match, ok = scan(+1)
        elif direction == "forward":
            match, ok = scan(-1)
        else:  # nearest: strictly-smaller forward delta wins, ties backward
            b_match, b_ok = scan(+1)
            f_match, f_ok = scan(-1)
            bd = np.full(n, np.inf)
            fd = np.full(n, np.inf)
            bd[b_ok] = np.abs(ts_num[b_ok] - ts_num[b_match[b_ok]]).astype(np.float64)
            fd[f_ok] = np.abs(ts_num[f_ok] - ts_num[f_match[f_ok]]).astype(np.float64)
            use_f = fd < bd
            match = np.where(use_f, f_match, b_match)
            ok = b_ok | f_ok
        if tol_num is not None and n:
            safe = np.maximum(match, 0)
            delta = np.abs(ts_num - ts_num[safe]).astype(np.float64)
            ok = ok & (delta <= tol_num)

        is_left = side == 0
        take_left = pa.array(np.flatnonzero(is_left))
        take_right = pa.array(
            match[is_left], pa.int64(), mask=~ok[is_left]
        )
        cols = {}
        for name, typ in out_fields:
            if name in val_cols:
                cols[name] = t.column(name).take(take_right).combine_chunks().cast(typ)
            else:
                cols[name] = t.column(name).take(take_left)
        return pa.table(cols)

    if hot_threshold is not None:
        return _asof_hot_split(
            left_ds, right_ds, both, keys, left_ts, right_ts, per_bucket,
            direction, hot_threshold, target_seg_rows, num_buckets,
            union_schema,
        )
    return bucketed_group_map(both, keys, [], per_bucket, num_buckets=num_buckets)


def _asof_analyze_union(left_ds, right_ds, keys, left_ts, right_ts):
    """Pruned (key, __ts__) union of both join inputs — the cheap stand-in
    for the hot-split analyze passes (the padded full-schema union would
    re-execute both pads per scan)."""
    from nvtabular_ray.arrow_utils import dataset_arrow_schema

    lt = dataset_arrow_schema(left_ds)
    ts_type = lt.field(left_ts).type

    def mk(ts_name):
        def f(t: pa.Table) -> pa.Table:
            cols = {k: t.column(k) for k in keys}
            cols["__ts__"] = t.column(ts_name).cast(ts_type)
            return pa.table(cols)

        return f

    a = left_ds.select_columns(list(dict.fromkeys(keys + [left_ts]))).map_batches(
        mk(left_ts), batch_format="pyarrow", zero_copy_batch=True
    )
    b = right_ds.select_columns(list(dict.fromkeys(keys + [right_ts]))).map_batches(
        mk(right_ts), batch_format="pyarrow", zero_copy_batch=True
    )
    return a.union(b)


def _asof_hot_split(
    left_ds, right_ds, both, keys, left_ts, right_ts, per_bucket,
    direction, hot_threshold, target_seg_rows, num_buckets, union_schema,
):
    """Hot-key as-of join: segment the union by (key, time), run the SAME
    per-bucket scan per segment with the carry-in boundary right rows
    injected. Boundary rows are strictly outside the segment's ts range
    (equal-ts rows always share a segment), so tie-break semantics are
    untouched; injected rows are side=1 and never appear in the output."""
    if len(keys) != 1:
        raise ValueError("hot_threshold requires a single-column join key")
    key = keys[0]
    from nvtabular_ray.pipelines.hot_split import _run_hot_split

    need_last = direction in ("backward", "nearest")
    need_first = direction in ("forward", "nearest")

    def summarize(seg: pa.Table) -> dict:
        side = seg.column(_SIDE).to_numpy(zero_copy_only=False)
        ridx = np.flatnonzero(side == 1)
        out = {"last": None, "first": None}
        if len(ridx):
            ts = seg.column("__ts__").to_numpy(zero_copy_only=False)
            rts = ts[ridx]
            if need_last:
                i = int(ridx[np.flatnonzero(rts == rts.max())[-1]])
                out["last"] = seg.take(pa.array([i]))
            if need_first:
                i = int(ridx[np.flatnonzero(rts == rts.min())[0]])
                out["first"] = seg.take(pa.array([i]))
        return out

    def fold(segs: list[dict]) -> list[dict]:
        m = len(segs)
        carries: list[dict] = [dict() for _ in range(m)]
        run = None
        for j in range(m):  # later segment == larger ts == better backward pick
            carries[j]["last"] = run
            if segs[j].get("last") is not None:
                run = segs[j]["last"]
        run = None
        for j in range(m - 1, -1, -1):
            carries[j]["first"] = run
            if segs[j].get("first") is not None:
                run = segs[j]["first"]
        return carries

    def hot_fn(seg: pa.Table, carry: dict) -> pa.Table:
        inject = [x for x in (carry.get("last"), carry.get("first")) if x is not None]
        if inject:
            seg = pa.concat_tables(
                [seg] + [x.select(seg.column_names) for x in inject],
                promote_options="default",
            )
        return per_bucket(seg)

    return _run_hot_split(
        both, key, "__ts__",
        cold_fn=per_bucket,
        summarize_fn=summarize,
        fold_fn=fold,
        hot_fn=hot_fn,
        empty_summary={"last": None, "first": None},
        hot_threshold=hot_threshold, target_seg_rows=target_seg_rows,
        num_buckets=num_buckets,
        analyze_ds=_asof_analyze_union(left_ds, right_ds, keys, left_ts, right_ts),
        schema=union_schema,
    )


def range_join(
    left_ds,
    right_ds,
    key: Union[str, list[str]],
    left_ts: str,
    lower,
    upper,
    right_ts: Optional[str] = None,
    right_cols: Optional[list[str]] = None,
    how: str = "inner",
    suffix: str = "_range",
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Range (interval) join: every left row pairs with EVERY right row of
    the same key whose ``right_ts`` lies in ``[left_ts + lower, left_ts +
    upper]`` (bounds inclusive; either may be negative — e.g. ``lower=-1h,
    upper=0`` joins the trailing hour). One output row per match;
    ``how="left"`` additionally keeps unmatched left rows with null right
    values. SQL analog: an inequality join ``ON r.key = l.key AND r.ts
    BETWEEN l.ts + lower AND l.ts + upper``.

    New scope beyond the reference (SURVEY.md §2.3 lists no range join);
    the nearest sibling is RollingAgg's trailing window, which aggregates
    instead of enumerating matches.

    Physical plan: same single-shuffle union as :func:`asof_join`, then per
    bucket both bounds resolve with TWO global searchsorteds over a
    per-key-rebased time axis (each key's right rows occupy a disjoint
    band, so probes cannot cross key boundaries) and one repeat/gather
    emits all pairs — no per-row or per-key Python loop.

    Skew note: a hot key with R right rows and L left rows emits O(L·R)
    pairs by definition; bound ``upper - lower`` to bound the blowup.
    ``hot_threshold``: optional skew guard — keys whose combined row count
    exceeds it are split into time segments; the interval is BOUNDED, so
    exactness needs no carries: right rows within ``|lower|``/``upper`` of
    a cut replicate to the neighbor segment (side-aware halos — left rows
    never replicate, so each (left, right) pair is emitted exactly once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    right_ts = right_ts or left_ts
    both, out_fields, val_cols, union_schema = _union_sides(
        left_ds, right_ds, keys, left_ts, right_ts, right_cols, suffix
    )

    def _bound_num(bound, ts_arr):
        if ts_arr.dtype.kind == "M":
            unit = np.datetime_data(ts_arr.dtype)[0]
            return int(
                pd.Timedelta(bound).to_timedelta64().astype(f"timedelta64[{unit}]").view("i8")
            )
        return bound

    def per_bucket(t: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.hashing import hash64_columns

        n = t.num_rows
        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        ts = t.column("__ts__").to_numpy(zero_copy_only=False)
        ts_num = ts.view("i8") if ts.dtype.kind in "mM" else ts
        kh = hash64_columns(t, keys).astype(np.int64)
        lo_off, hi_off = _bound_num(lower, ts), _bound_num(upper, ts)

        is_r = side == 1
        r_idx = np.flatnonzero(is_r)
        l_idx = np.flatnonzero(~is_r)
        kh_r, ts_r = kh[r_idx], ts_num[r_idx]
        order_r = np.lexsort((ts_r, kh_r))
        kh_rs, ts_rs = kh_r[order_r], ts_r[order_r]
        r_orig = r_idx[order_r]  # sorted-right position -> original row

        # dense group ids over sorted right rows + per-group min ts
        nr = len(r_orig)
        if nr:
            change = np.r_[True, kh_rs[1:] != kh_rs[:-1]]
            gstarts = np.flatnonzero(change)
            gid_r = np.cumsum(change) - 1
            uniq_kh = kh_rs[gstarts]
            gmin = ts_rs[gstarts]
            rel_r = ts_rs - gmin[gid_r]
            # band stride: probes are clamped to [-1, max_rel + 1]
            max_rel = int(rel_r.max())
        else:
            uniq_kh = np.empty(0, np.int64)

        # left probes
        lt = ts_num[l_idx]
        if nr and len(l_idx):
            gi = np.searchsorted(uniq_kh, kh[l_idx])
            gi_c = np.minimum(gi, len(uniq_kh) - 1)
            has_key = uniq_kh[gi_c] == kh[l_idx]
            stride = max_rel + 3
            if len(uniq_kh) * stride < 2**62:
                axis = rel_r + gid_r * stride
                rel_lo = np.clip(lt + lo_off - gmin[gi_c], -1, max_rel + 1)
                rel_hi = np.clip(lt + hi_off - gmin[gi_c], -1, max_rel + 1)
                lo_pos = np.searchsorted(axis, rel_lo + gi_c * stride, side="left")
                hi_pos = np.searchsorted(axis, rel_hi + gi_c * stride, side="right")
            else:  # rebased axis would overflow: per-key loop (gigantic bucket)
                gends = np.r_[gstarts[1:], nr]
                lo_pos = np.empty(len(l_idx), np.int64)
                hi_pos = np.empty(len(l_idx), np.int64)
                for j in range(len(l_idx)):
                    g0, g1 = gstarts[gi_c[j]], gends[gi_c[j]]
                    lo_pos[j] = g0 + np.searchsorted(ts_rs[g0:g1], lt[j] + lo_off, "left")
                    hi_pos[j] = g0 + np.searchsorted(ts_rs[g0:g1], lt[j] + hi_off, "right")
            counts = np.where(has_key, np.maximum(hi_pos - lo_pos, 0), 0)
        else:
            counts = np.zeros(len(l_idx), np.int64)
            lo_pos = np.zeros(len(l_idx), np.int64)

        total = int(counts.sum())
        # enumerate all (left, right) pairs with one repeat + arange gather
        out_l = np.repeat(l_idx, counts)
        offs = np.cumsum(counts) - counts
        j = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        out_r = r_orig[np.repeat(lo_pos, counts) + j] if total else np.empty(0, np.int64)
        mask = np.zeros(total, dtype=bool)
        if how == "left":
            miss = l_idx[counts == 0]
            out_l = np.concatenate([out_l, miss])
            out_r = np.concatenate([out_r, np.zeros(len(miss), np.int64)])
            mask = np.concatenate([mask, np.ones(len(miss), dtype=bool)])

        take_left = pa.array(out_l)
        take_right = pa.array(out_r, pa.int64(), mask=mask)
        cols = {}
        for name, typ in out_fields:
            if name in val_cols:
                cols[name] = t.column(name).take(take_right).combine_chunks().cast(typ)
            else:
                cols[name] = t.column(name).take(take_left)
        return pa.table(cols)

    if hot_threshold is not None:
        return _range_hot_split(
            left_ds, right_ds, both, keys, left_ts, right_ts, per_bucket,
            lower, upper, hot_threshold, target_seg_rows, num_buckets,
            union_schema,
        )
    return bucketed_group_map(both, keys, [], per_bucket, num_buckets=num_buckets)


def _range_hot_split(
    left_ds, right_ds, both, keys, left_ts, right_ts, per_bucket,
    lower, upper, hot_threshold, target_seg_rows, num_buckets, union_schema,
):
    """Hot-key range join: the interval is bounded, so exactness needs only
    SIDE-AWARE HALOS — right rows within |lower|/upper of a cut replicate
    to the neighbor segment (left rows never replicate: each left row lives
    in exactly one segment and sees each right row at most once, so every
    (left, right) pair is emitted exactly once). No carries."""
    if len(keys) != 1:
        raise ValueError("hot_threshold requires a single-column join key")
    from nvtabular_ray.pipelines.hot_split import _run_hot_split

    if pa.types.is_timestamp(union_schema.field("__ts__").type):
        # hot-split cut comparisons run on a microsecond axis
        lo = int(pd.Timedelta(lower).to_timedelta64().astype("timedelta64[us]").view("i8"))
        up = int(pd.Timedelta(upper).to_timedelta64().astype("timedelta64[us]").view("i8"))
    else:
        lo, up = int(lower), int(upper)
    wt = max(0, -lo)  # right rows this far BEFORE a cut replicate forward
    wl = max(0, up)   # right rows this far AFTER a cut replicate backward

    return _run_hot_split(
        both, keys[0], "__ts__",
        cold_fn=per_bucket,
        summarize_fn=lambda seg: {},
        fold_fn=lambda segs: [dict() for _ in segs],
        hot_fn=lambda seg, carry: per_bucket(seg),
        empty_summary={},
        wt=wt, wl=wl, min_spacing=max(wt, wl, 1) + 1,
        halo_col=_SIDE,
        hot_threshold=hot_threshold, target_seg_rows=target_seg_rows,
        num_buckets=num_buckets,
        analyze_ds=_asof_analyze_union(left_ds, right_ds, keys, left_ts, right_ts),
        schema=union_schema,
    )


def windowed_agg(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    value_col: str,
    window_seconds: float,
    aggs: list[str] = ("count", "sum", "mean"),
    prefix: Optional[str] = None,
    num_buckets: Optional[int] = None,
    direction: str = "trailing",
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Per-row window aggregates: for each row, aggregate ``value_col``
    over the same entity's rows in [ts - window, ts] (``direction=
    "trailing"``, default — inclusive-left, SQL ``RANGE W PRECEDING``
    parity, past-only, zero leakage; pandas ``rolling(closed='right')``
    uses (ts - window, ts] and will differ on boundary rows) or [ts, ts + window]
    (``"leading"`` — SQL ``CURRENT ROW AND W FOLLOWING``, for label
    windows). Output columns ``{prefix}{agg}`` appended to the input row.
    ``aggs`` may include ``"distinct"`` (windowed ``count(DISTINCT v)``,
    any column type, nulls not counted — works with ``hot_threshold``:
    bounded-window distinct is halo-exact).
    ``hot_threshold``: optional skew guard (see ``sessionize``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    tag = "w" if direction == "trailing" else "lead"
    prefix = prefix or f"{value_col}_{tag}{int(window_seconds)}s_"
    if hot_threshold is not None:
        hs_names = [f"{value_col}_{tag}{int(window_seconds)}s_{a}" for a in aggs]
        return _via_hot_split(
            ds, keys, ts_col,
            [{"kind": "rolling", "col": value_col, "window": window_seconds,
              "aggs": list(aggs), "direction": direction}],
            {h: f"{prefix}{a}" for h, a in zip(hs_names, aggs) if h != f"{prefix}{a}"},
            hot_threshold, target_seg_rows, num_buckets,
        )

    from nvtabular_ray.ops.temporal_ops import RollingAgg

    op = RollingAgg(keys, ts_col, window_seconds, aggs=list(aggs), direction=direction)

    def per_bucket(t: pa.Table) -> pa.Table:
        from nvtabular_ray.selector import ColumnSelector

        res = op.transform(ColumnSelector([value_col]), t)
        for a in aggs:
            t = t.append_column(f"{prefix}{a}", res.column(op._out_name(value_col, a)))
        return t

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


def expanding_agg(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    value_col: str,
    aggs: list[str] = ("count", "sum", "mean"),
    prefix: Optional[str] = None,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Per-row cumulative aggregates of ``value_col`` over all same-entity
    rows with STRICTLY earlier ts (unbounded past-only window, equal-ts
    peers excluded — SQL ``RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW EXCLUDE GROUP``). Output columns ``{prefix}{agg}`` appended to the
    input row. ``aggs`` may include ``"distinct"`` (cumulative
    ``count(DISTINCT v)``; NOT supported with ``hot_threshold`` — the
    carry would be the unbounded set of already-seen values).
    ``hot_threshold``: optional skew guard (see ``sessionize``)."""
    keys = [key] if isinstance(key, str) else list(key)
    prefix = prefix or f"{value_col}_cum_"
    if hot_threshold is not None:
        hs_names = [f"{value_col}_cum_{a}" for a in aggs]
        return _via_hot_split(
            ds, keys, ts_col,
            [{"kind": "expanding", "col": value_col, "aggs": list(aggs)}],
            {h: f"{prefix}{a}" for h, a in zip(hs_names, aggs) if h != f"{prefix}{a}"},
            hot_threshold, target_seg_rows, num_buckets,
        )

    from nvtabular_ray.ops.temporal_ops import ExpandingAgg

    op = ExpandingAgg(keys, ts_col, aggs=list(aggs))

    def per_bucket(t: pa.Table) -> pa.Table:
        from nvtabular_ray.selector import ColumnSelector

        res = op.transform(ColumnSelector([value_col]), t)
        for a in aggs:
            t = t.append_column(f"{prefix}{a}", res.column(op._out_name(value_col, a)))
        return t

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


def backfill(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    cols: list[str],
    direction: str = "forward",
    out_suffix: str = "_filled",
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Windowed backfill: within each entity ordered by ``ts_col``, fill null
    values of ``cols`` from the most recent earlier non-null row
    (``direction="forward"``, past-only, leakage-free) or the nearest later
    one (``direction="backward"`` — training-label style backfill).
    ``hot_threshold``: optional skew guard (see ``sessionize``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be forward or backward")
    if hot_threshold is not None:
        return _via_hot_split(
            ds, keys, ts_col,
            [{"kind": "backfill", "col": c, "direction": direction,
              "out": f"{c}{out_suffix}"} for c in cols],
            None, hot_threshold, target_seg_rows, num_buckets,
        )

    import pyarrow.compute as pc

    from nvtabular_ray.functions.grouped_np import grouped_fill_indices, group_ids_sorted

    def per_bucket(t: pa.Table) -> pa.Table:
        gid = group_ids_sorted(t, keys)
        for c in cols:
            col = t.column(c).combine_chunks()
            valid = ~pc.is_null(col, nan_is_null=True).to_numpy(zero_copy_only=False)
            gather, ok = grouped_fill_indices(valid, gid, direction)
            filled = pc.take(col, pa.array(gather, pa.int64(), mask=~ok))
            t = t.append_column(f"{c}{out_suffix}", filled)
        return t

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


def resample_grid(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    value_cols: list[str],
    step,
    out_ts: str = "grid_ts",
    num_buckets: Optional[int] = None,
):
    """Per-entity fixed-step resampling: emit one row per epoch-aligned grid
    tick in [ceil(entity_min/step)*step, entity_max], each carrying the
    entity's LAST observation at or before the tick (LOCF — SQL ``grid ASOF
    JOIN obs ON grid.ts >= obs.ts`` parity; a null value at the picked row
    stays null, compose with ``backfill`` for last-NON-NULL). The
    event-stream → regular-timeseries step before windowed models.

    Scale shape: one bucketed entity exchange (same as every ordered op);
    inside a bucket the grid is generated vectorized (per-entity tick
    counts → one repeat + arange), and the LOCF gather is ONE global
    ``searchsorted`` on the group-normalized composite axis (the
    grouped_window_bounds trick) — no per-entity Python. Output cardinality
    is sum(ceil(span/step)) per entity; pick ``step`` accordingly."""
    from nvtabular_ray.functions.grouped_np import (
        group_ids_sorted,
        group_starts,
        group_time_order,
    )
    from nvtabular_ray.ops.temporal_ops import _ts_to_int_us

    keys = [key] if isinstance(key, str) else list(key)
    step_s = step.total_seconds() if isinstance(step, pd.Timedelta) else step

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        gid = group_ids_sorted(t, keys)
        ts, is_ts = _ts_to_int_us(t.column(ts_col))
        step_us = int(step_s * 1_000_000) if is_ts else int(step_s)
        order = group_time_order(gid, ts)
        if order is not None:
            take = pa.array(order)
            t = t.take(take)
            ts, gid = ts[order], gid[order]
        n = len(ts)
        starts = group_starts(gid)
        counts = np.diff(np.r_[starts, n])
        ends = starts + counts
        tmin, tmax = ts[starts], ts[ends - 1]
        gstart = -(-tmin // step_us) * step_us  # ceil to the epoch grid
        cnt = np.maximum((tmax - gstart) // step_us + 1, 0)
        total = int(cnt.sum())
        n_g = len(starts)
        grp = np.repeat(np.arange(n_g, dtype=np.float64), cnt).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(cnt)])
        pos = np.arange(total, dtype=np.int64) - cum[grp]
        gts = gstart[grp] + pos * step_us
        # LOCF: one searchsorted on the group-normalized composite axis
        rel_obs = ts - tmin[gid]
        stride = int(rel_obs.max() if n else 0) + step_us + 2
        obs_axis = rel_obs + gid * stride
        grid_axis = (gts - tmin[grp]) + grp * stride
        idx = np.searchsorted(obs_axis, grid_axis, side="right") - 1
        idx_pa = pa.array(idx)
        cols = {}
        for k in keys:
            cols[k] = t.column(k).take(pa.array(starts[grp]))
        if is_ts:
            cols[out_ts] = pa.array(gts).cast(pa.timestamp("us"))
        else:
            cols[out_ts] = pa.array(gts)
        for c in value_cols:
            cols[c] = t.column(c).take(idx_pa)
        return pa.table(cols)

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


def context_concat(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    text_col: str,
    k: int = 3,
    sep: str = "\n",
    prefix_col: Optional[str] = None,
    prefix_sep: str = ": ",
    out_col: Optional[str] = None,
    sort_cols: Optional[list[str]] = None,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Previous-k context assembly as a pipeline call (the functional form
    of ``ops.ContextConcat`` — same kernels): each row gains the
    ``sep``-join of the up-to-k rendered texts before it within the entity.
    ``hot_threshold``: mega-conversations split into time segments; the
    frame stays row-exact across cuts via rendered-tail carries."""
    keys = [key] if isinstance(key, str) else list(key)
    out = out_col or f"{text_col}_ctx{int(k)}"
    if hot_threshold is not None:
        spec = {"kind": "context", "col": text_col, "k": int(k), "sep": sep,
                "prefix_col": prefix_col, "prefix_sep": prefix_sep, "out": out}
        return _via_hot_split(
            ds, keys, ts_col, [spec], None, hot_threshold, target_seg_rows,
            num_buckets, sort_cols=list(sort_cols or []),
        )

    from nvtabular_ray.ops.context import ContextConcat
    from nvtabular_ray.selector import ColumnSelector

    op = ContextConcat(
        keys, k=k, sort_cols=[ts_col] + list(sort_cols or []), sep=sep,
        prefix_col=prefix_col, prefix_sep=prefix_sep, out_suffix="__tmp__",
    )
    sel = ColumnSelector([text_col] + op.dependencies)

    def per_bucket(t: pa.Table) -> pa.Table:
        res = op.transform(sel, t)
        return t.append_column(out, res.column(f"{text_col}___tmp__"))

    return bucketed_group_map(
        ds, keys, [ts_col] + list(sort_cols or []), per_bucket, num_buckets=num_buckets
    )


def group_rank(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    method: str = "row_number",
    out_col: Optional[str] = None,
    n: Optional[int] = None,
    sort_cols: Optional[list[str]] = None,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Per-entity rank features as a pipeline call (functional form of
    ``ops.GroupRank``). ``hot_threshold`` supports row_number /
    percent_rank / ntile (row-count + entity-total carries); dense_rank is
    unsplit-only — a tie group could straddle a segment cut."""
    keys = [key] if isinstance(key, str) else list(key)
    out = out_col or method
    if hot_threshold is not None:
        if method == "dense_rank":
            raise ValueError("hot_threshold does not support method='dense_rank'")
        return _via_hot_split(
            ds, keys, ts_col, [{"kind": "rank", "method": method, "n": n, "out": out}],
            None, hot_threshold, target_seg_rows, num_buckets,
            sort_cols=list(sort_cols or []),
        )

    from nvtabular_ray.ops.rank import GroupRank
    from nvtabular_ray.selector import ColumnSelector

    op = GroupRank(keys, [ts_col] + list(sort_cols or []), method=method, out_col=out, n=n)
    sel = ColumnSelector(op.dependencies)

    def per_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(out, op.transform(sel, t).column(out))

    return bucketed_group_map(
        ds, keys, [ts_col] + list(sort_cols or []), per_bucket, num_buckets=num_buckets
    )


def shift_values(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    cols: Union[str, list[str]],
    shift: Union[int, list[int]] = 1,
    sort_cols: Optional[list[str]] = None,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Raw dtype-preserving lag/lead per entity as a pipeline call
    (functional form of ``ops.Shift``): ``{col}_shift_{k}`` columns
    appended. ``hot_threshold`` routes through hot-entity splitting with
    raw-value boundary carries (hot_split.py "shift" spec)."""
    keys = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    shifts = [shift] if isinstance(shift, int) else list(shift)
    if hot_threshold is not None:
        specs = [
            {"kind": "shift", "col": c, "shift": k} for c in cols for k in shifts
        ]
        return _via_hot_split(
            ds, keys, ts_col, specs, None, hot_threshold, target_seg_rows,
            num_buckets, sort_cols=list(sort_cols or []),
        )

    from nvtabular_ray.ops.shift import Shift
    from nvtabular_ray.selector import ColumnSelector

    op = Shift(keys, shift=shifts, sort_cols=[ts_col] + list(sort_cols or []))
    sel = ColumnSelector(cols + op.dependencies)

    def per_bucket(t: pa.Table) -> pa.Table:
        res = op.transform(ColumnSelector(cols), t)
        for name in res.column_names:
            t = t.append_column(name, res.column(name))
        return t

    return bucketed_group_map(
        ds, keys, [ts_col] + list(sort_cols or []), per_bucket, num_buckets=num_buckets
    )


def last_where(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    cols: Union[str, list[str]],
    cond_col: str,
    sort_cols: Optional[list[str]] = None,
    include_current: bool = False,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Most recent matching row's fields per entity as a pipeline call
    (functional form of ``ops.LastWhere``; row-level semantics, see the op
    docstring). ``hot_threshold`` carries the last matched row's values
    across segments (hot_split.py "last_where" spec)."""
    keys = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    if hot_threshold is not None:
        if include_current:
            raise ValueError("hot_threshold supports include_current=False only")
        specs = [{"kind": "last_where", "col": c, "cond": cond_col} for c in cols]
        return _via_hot_split(
            ds, keys, ts_col, specs, None, hot_threshold, target_seg_rows,
            num_buckets, sort_cols=list(sort_cols or []),
        )

    from nvtabular_ray.ops.last_where import LastWhere
    from nvtabular_ray.selector import ColumnSelector

    op = LastWhere(
        keys, cond_col=cond_col, sort_cols=[ts_col] + list(sort_cols or []),
        include_current=include_current,
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        res = op.transform(ColumnSelector(cols), t)
        for name in res.column_names:
            t = t.append_column(name, res.column(name))
        return t

    return bucketed_group_map(
        ds, keys, [ts_col] + list(sort_cols or []), per_bucket, num_buckets=num_buckets
    )


def ewma(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    cols: Union[str, list[str]],
    alpha: Optional[float] = None,
    halflife=None,
    sort_cols: Optional[list[str]] = None,
    num_buckets: Optional[int] = None,
    hot_threshold: Optional[int] = None,
    target_seg_rows: int = 250_000,
):
    """Trailing exponentially weighted mean per entity as a pipeline call
    (functional form of ``ops.Ewma``; pass exactly one of ``alpha=`` for
    row decay — adjust=False — or ``halflife=`` seconds for time decay
    over the actual ts axis). ``hot_threshold`` folds the carried state
    through the linear recurrence (hot_split.py "ewma" spec; alpha mode
    requires non-null values, time mode tolerates them)."""
    keys = [key] if isinstance(key, str) else list(key)
    cols = [cols] if isinstance(cols, str) else list(cols)
    if (alpha is None) == (halflife is None):
        raise ValueError("pass exactly one of alpha= or halflife=")
    if hot_threshold is not None:
        if alpha is not None:
            specs = [{"kind": "ewma", "col": c, "alpha": float(alpha)} for c in cols]
        else:
            hl = halflife.total_seconds() if hasattr(halflife, "total_seconds") else halflife
            specs = [{"kind": "ewma", "col": c, "halflife": float(hl)} for c in cols]
        return _via_hot_split(
            ds, keys, ts_col, specs, None, hot_threshold, target_seg_rows,
            num_buckets, sort_cols=list(sort_cols or []),
        )

    from nvtabular_ray.ops.ewma import Ewma
    from nvtabular_ray.selector import ColumnSelector

    if alpha is not None:
        op = Ewma(keys, alpha=float(alpha), sort_cols=[ts_col] + list(sort_cols or []))
    else:
        op = Ewma(
            keys, halflife=halflife, ts_col=ts_col, sort_cols=list(sort_cols or [])
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        res = op.transform(ColumnSelector(cols), t)
        for name in res.column_names:
            t = t.append_column(name, res.column(name))
        return t

    return bucketed_group_map(
        ds, keys, [ts_col] + list(sort_cols or []), per_bucket, num_buckets=num_buckets
    )
