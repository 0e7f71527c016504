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
):
    """Point-in-time as-of join: for every left row, attach the LATEST right
    row of the same key with ``right_ts <= left_ts`` (``<`` when
    ``strict=True`` — use strict for feature tables derived from the same
    events to exclude the current instant). Left rows keep all columns;
    unmatched rows get nulls. Rough SQL analog: DuckDB ``ASOF LEFT JOIN``.

    Physical plan: pad both sides to a common schema with a side tag, union,
    hash-bucket by key (ONE shuffle moves both sides together), then per
    bucket a vectorized ``pd.merge_asof`` over key-sorted time-sorted rows.
    No driver materialization; both sides stream.
    """
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
        # matched right values. No pandas copy; dtypes exact by construction.
        from nvtabular_ray.functions.hashing import hash64_columns

        side = t.column(_SIDE).to_numpy(zero_copy_only=False)
        ts = t.column("__ts__").to_numpy(zero_copy_only=False)
        # keys may be strings: group identity via the same 64-bit hash the
        # exchange used (collision within one bucket is negligible and the
        # bucket already holds only whole key groups)
        kh = hash64_columns(t, keys).astype(np.int64)
        # tie-break: allow_exact -> right (1) before left (0) at equal ts
        tie = -side if not strict else side
        order = np.lexsort((tie, ts, kh))
        n = len(order)
        side_s, kh_s = side[order], kh[order]
        grp_start = np.zeros(n, dtype=np.int64)
        if n:
            change = np.r_[True, kh_s[1:] != kh_s[:-1]]
            starts = np.flatnonzero(change)
            grp_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        src = np.where(side_s == 1, np.arange(n), -1)
        last_right = np.maximum.accumulate(src) if n else src
        matched = last_right >= grp_start
        is_left = side_s == 0
        left_pos = order[is_left]  # original row index of each left row
        m_left = matched[is_left]
        r_sorted_idx = last_right[is_left]
        # map matched right rows back to original row indices; null -> null take
        r_orig = order[np.maximum(r_sorted_idx, 0)]
        take_left = pa.array(left_pos)
        take_right = pa.array(r_orig, pa.int64(), mask=~m_left)
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
