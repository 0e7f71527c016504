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


def sessionize(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    gap,
    out_col: str = "session_id",
    num_buckets: Optional[int] = None,
):
    """Assign 0-based session indices per entity: a new session starts when
    the time since the previous row of the same entity exceeds ``gap``
    (seconds or pd.Timedelta). Rows keep all input columns + ``out_col``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    gap_s = gap.total_seconds() if isinstance(gap, pd.Timedelta) else gap

    from nvtabular_ray.ops.temporal_ops import Sessionize

    op = Sessionize(keys, ts_col, gap_s, out_col=out_col)

    def per_bucket(t: pa.Table) -> pa.Table:
        from nvtabular_ray.selector import ColumnSelector

        sid = op.transform(ColumnSelector([ts_col]), t)
        return t.append_column(out_col, sid.column(out_col))

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)


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
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    right_ts = right_ts or left_ts

    left_schema = left_ds.schema(fetch_if_missing=True)
    right_schema = right_ds.schema(fetch_if_missing=True)
    left_cols = list(left_schema.names)
    r_cols = right_cols or [c for c in right_schema.names if c not in keys and c != right_ts]
    right_keep = keys + [right_ts] + [c for c in r_cols if c not in keys and c != right_ts]

    # resolve output names for right value columns (suffix on collision)
    out_name = {}
    for c in r_cols:
        out_name[c] = c + suffix if c in left_cols else c

    right_types = dict(zip(right_schema.names, right_schema.types))
    left_types = dict(zip(left_schema.names, left_schema.types))
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
    l_pad = l_pad.select_columns(order)
    r_pad = r_pad.select_columns(order)
    both = l_pad.union(r_pad)

    val_cols = [out_name[c] for c in r_cols]
    # fixed output schema: unmatched right values must stay their Arrow type
    # (nulls), not drift to float64 when pandas injects NaN in some buckets
    out_fields = [(c, left_types[c]) for c in left_cols] + [
        (out_name[c], right_types[c]) for c in r_cols
    ]

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
            order = np.lexsort((tie, sign * ts_num, kh))
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

    return bucketed_group_map(both, keys, [], per_bucket, num_buckets=num_buckets)


def windowed_agg(
    ds,
    key: Union[str, list[str]],
    ts_col: str,
    value_col: str,
    window_seconds: float,
    aggs: list[str] = ("count", "sum", "mean"),
    prefix: Optional[str] = None,
    num_buckets: Optional[int] = None,
):
    """Per-row trailing-window aggregates: for each row, aggregate
    ``value_col`` over the same entity's rows in (ts - window, ts]
    — inclusive of the current row, past-only (zero leakage).
    Output columns ``{prefix}{agg}`` appended to the input row.
    """
    keys = [key] if isinstance(key, str) else list(key)
    prefix = prefix or f"{value_col}_w{int(window_seconds)}s_"

    from nvtabular_ray.ops.temporal_ops import RollingAgg

    op = RollingAgg(keys, ts_col, window_seconds, aggs=list(aggs))

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
):
    """Windowed backfill: within each entity ordered by ``ts_col``, fill null
    values of ``cols`` from the most recent earlier non-null row
    (``direction="forward"``, past-only, leakage-free) or the nearest later
    one (``direction="backward"`` — training-label style backfill).
    """
    keys = [key] if isinstance(key, str) else list(key)
    if direction not in ("forward", "backward"):
        raise ValueError("direction must be forward or backward")

    import pyarrow.compute as pc

    from nvtabular_ray.functions.grouped_np import group_ids_sorted, group_starts

    def per_bucket(t: pa.Table) -> pa.Table:
        n = t.num_rows
        gid = group_ids_sorted(t, keys)
        starts = group_starts(gid)
        counts = np.diff(np.r_[starts, n])
        gstart = np.repeat(starts, counts)
        idx = np.arange(n, dtype=np.int64)
        for c in cols:
            col = t.column(c).combine_chunks()
            valid = ~pc.is_null(col, nan_is_null=True).to_numpy(zero_copy_only=False)
            if direction == "forward":
                last_valid = np.maximum.accumulate(np.where(valid, idx, -1))
                ok = last_valid >= gstart
                gather = np.where(ok, last_valid, 0)
            else:
                gend = gstart + np.repeat(counts, counts) - 1
                nxt = np.flip(np.minimum.accumulate(np.flip(np.where(valid, idx, n))))
                ok = nxt <= gend
                gather = np.where(ok, np.minimum(nxt, n - 1), 0)
            filled = pc.take(col, pa.array(gather, pa.int64(), mask=~ok))
            t = t.append_column(f"{c}{out_suffix}", filled)
        return t

    return bucketed_group_map(ds, keys, [ts_col], per_bucket, num_buckets=num_buckets)
