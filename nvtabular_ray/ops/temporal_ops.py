"""Partitioned temporal ops: Sessionize and RollingAgg.

Op-form of pipelines/temporal.py so they FUSE into the workflow's single
bucketed key shuffle alongside DifferenceLag/Categorify/etc. — one shuffle
for the whole ordered feature set instead of one per op. NEW SCOPE vs the
reference (north rule: sessionization + windowed features); ordering
guarantees come from the workflow compiler (ops/base.py partition_cols).

Hot path is pure numpy over key-sorted arrays (functions/grouped_np.py):
group-change-point detection, cumsum session ids, one searchsorted for all
trailing windows — no pandas groupby in the per-row path.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.functions.grouped_np import (
    _agg_over_bounds,
    dict_codes as _dict_codes,
    distinct_over_bounds,
    group_ids_sorted,
    group_starts,
    group_time_order,
    grouped_expanding_bounds,
    grouped_sessionize,
    grouped_window_bounds,
    grouped_window_bounds_leading,
)
from nvtabular_ray.ops.base import Operator


def _is_numeric(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_boolean(t)
        or pa.types.is_decimal(t)
    )


def _column_window_results(column, order, aggs, gid_k, get_bounds, run_float) -> dict:
    """Per-column window results: numeric columns run the float-prefix-sum
    kernels; non-numeric columns (strings — e.g. a tool/role column) support
    ``count`` (validity over bounds) and ``distinct`` (dictionary codes),
    never a float cast. ``get_bounds`` is a memoized (w, end) supplier so
    the searchsorted work happens at most once per table."""
    a = column.combine_chunks() if isinstance(column, pa.ChunkedArray) else column
    res: dict = {}
    float_aggs = [x for x in aggs if x != "distinct"]
    if float_aggs:
        if _is_numeric(a.type):
            vals = a.cast(pa.float64()).to_numpy(zero_copy_only=False)
            if order is not None:
                vals = vals[order]
            res = run_float(vals, float_aggs)
        elif set(float_aggs) <= {"count"}:
            valid = pc.is_valid(a).to_numpy(zero_copy_only=False)
            if order is not None:
                valid = valid[order]
            w, end = get_bounds()
            cv = np.concatenate([[0], np.cumsum(valid, dtype=np.int64)])
            res["count"] = cv[end] - cv[w]
        else:
            raise TypeError(
                f"window aggs {float_aggs} require a numeric column; "
                f"type {a.type} supports only count/distinct"
            )
    if "distinct" in aggs:
        codes, cvalid = _dict_codes(a)
        if order is not None:
            codes, cvalid = codes[order], cvalid[order]
        w, end = get_bounds()
        res["distinct"] = distinct_over_bounds(codes, cvalid, w, end, gid_k)
    return res


def _ts_to_int_us(arr) -> tuple[np.ndarray, bool]:
    """(int64 microseconds-or-raw-units, is_timestamp)."""
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        return pc.cast(a, pa.timestamp("us")).cast(pa.int64()).to_numpy(), True
    return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False), False


class Sessionize(Operator):
    """0-based per-entity session index; new session when the time since the
    previous row of the same entity exceeds ``gap`` (seconds for timestamp
    columns, raw units for numeric ts columns). Leakage-free: depends only on
    current/earlier rows of the entity.

    ``emit`` adds within-session position features in the SAME pass (all
    past-only): ``"turn_in_session"`` — 0-based row index inside the
    session; ``"sec_since_session_start"`` — elapsed time from the
    session's first row (float seconds for timestamp columns, raw units
    otherwise). Unsplit/fused path only — the hot-split "sessionize" spec
    carries session COUNTS, not the open session's start row."""

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        ts_col: str,
        gap: float,
        out_col: str = "session_id",
        emit: tuple = (),
        tie_cols: Optional[Union[str, list[str]]] = None,
    ):
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.ts_col = ts_col
        self.gap = gap
        self.out_col = out_col
        bad = [e for e in emit if e not in ("turn_in_session", "sec_since_session_start")]
        if bad:
            raise ValueError(
                f"unknown emit features {bad}; supported: "
                "turn_in_session, sec_since_session_start"
            )
        self.emit = tuple(emit)
        # tie-breakers matter only for turn_in_session under equal-ts rows
        # (session_id and elapsed time are tie-insensitive)
        self.tie_cols = [tie_cols] if isinstance(tie_cols, str) else list(tie_cols or [])
        self.sort_cols = [ts_col] + self.tie_cols

    @property
    def dependencies(self):
        return self.partition_cols + [self.ts_col] + [
            c for c in self.tie_cols if c not in self.partition_cols
        ]

    def column_mapping(self, col_selector):
        out = {self.out_col: [self.ts_col]}
        for e in self.emit:
            out[e] = [self.ts_col]
        return out

    def compute_output_schema(self, col_selector, input_schema):
        out = {self.out_col: pa.int64()}
        for e in self.emit:
            out[e] = pa.int64() if e == "turn_in_session" else pa.float64()
        return out

    def output_dtype(self):
        return None  # per-column (compute_output_schema)

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        gid = group_ids_sorted(table, self.partition_cols)
        ts, is_ts = _ts_to_int_us(table.column(self.ts_col))
        gap_units = int(self.gap * 1_000_000) if is_ts else int(self.gap)
        if self.tie_cols:
            from nvtabular_ray.functions.grouped_np import group_multi_order

            order = group_multi_order(table, gid, self.sort_cols)
        else:
            order = group_time_order(gid, ts)
        ts_k, gid_k = (ts, gid) if order is None else (ts[order], gid[order])
        sid_k = grouped_sessionize(ts_k, gid_k, gap_units)
        cols = {}

        def put(name, arr_k, dtype):
            if order is not None:
                back = np.empty(len(arr_k), arr_k.dtype)
                back[order] = arr_k
                arr_k = back
            cols[name] = pa.array(arr_k.astype(dtype, copy=False))

        put(self.out_col, sid_k, np.int64)
        if self.emit:
            # session change points over the sorted view: (entity, session)
            # boundaries are where gid or sid steps
            n = len(sid_k)
            new_sess = np.ones(n, dtype=bool)
            if n:
                new_sess[1:] = (gid_k[1:] != gid_k[:-1]) | (sid_k[1:] != sid_k[:-1])
            starts = np.flatnonzero(new_sess)
            start_of = np.repeat(starts, np.diff(np.r_[starts, n]))
            if "turn_in_session" in self.emit:
                put("turn_in_session", np.arange(n, dtype=np.int64) - start_of, np.int64)
            if "sec_since_session_start" in self.emit:
                elapsed = (ts_k - ts_k[start_of]).astype(np.float64)
                if is_ts:
                    elapsed /= 1_000_000.0
                put("sec_since_session_start", elapsed, np.float64)
        return pa.table(cols)


class RollingAgg(Operator):
    """Time-window aggregates per entity. ``direction="trailing"``
    (default): aggregate rows of the same entity in [ts - window, ts] —
    past-only, zero temporal leakage; output ``{col}_w{window}s_{agg}``.
    ``direction="leading"``: [ts, ts + window] (SQL ``CURRENT ROW AND W
    FOLLOWING``) — future-looking for LABEL windows (e.g. "events in the
    next 10 min"); output ``{col}_lead{window}s_{agg}``.

    ``aggs`` may include ``"distinct"`` — windowed ``count(DISTINCT v)``
    over any column type (the column is dictionary-encoded, never cast to
    float): e.g. "distinct tools the agent used in the last hour". Nulls
    are not counted (SQL parity).

    ``aggs`` may include ``"first"``/``"last"`` — the value at the
    window's first/last row ("latest latency reading in the trailing
    hour"). Equal-ts rows are window PEERS (RANGE semantics), so which
    peer is first/last follows the in-group row order: pass ``tie_cols``
    (extra sort columns after ts, e.g. a row id) whenever timestamps can
    tie, or the picked peer is partition-dependent."""

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        ts_col: str,
        window_seconds: float,
        aggs=("count", "sum", "mean"),
        direction: str = "trailing",
        tie_cols: Optional[Union[str, list[str]]] = None,
    ):
        if direction not in ("trailing", "leading"):
            raise ValueError(f"direction must be trailing|leading, got {direction!r}")
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.ts_col = ts_col
        self.window_seconds = window_seconds
        self.aggs = list(aggs)
        self.direction = direction
        self.tie_cols = [tie_cols] if isinstance(tie_cols, str) else list(tie_cols or [])
        self.sort_cols = [ts_col] + self.tie_cols

    @property
    def dependencies(self):
        return self.partition_cols + [self.ts_col] + [
            c for c in self.tie_cols if c not in self.partition_cols
        ]

    def _value_cols(self, col_selector):
        return [
            c
            for c in col_selector.names
            if c not in self.partition_cols
            and c != self.ts_col
            and c not in self.tie_cols
        ]

    def _out_name(self, col: str, agg: str) -> str:
        tag = "w" if self.direction == "trailing" else "lead"
        return f"{col}_{tag}{int(self.window_seconds)}s_{agg}"

    def column_mapping(self, col_selector):
        return {
            self._out_name(c, a): [c] for c in self._value_cols(col_selector) for a in self.aggs
        }

    def compute_output_schema(self, col_selector, input_schema):
        return {
            self._out_name(c, a): (pa.int64() if a in ("count", "distinct") else pa.float64())
            for c in self._value_cols(col_selector)
            for a in self.aggs
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        gid = group_ids_sorted(table, self.partition_cols)
        ts, is_ts = _ts_to_int_us(table.column(self.ts_col))
        window = int(self.window_seconds * 1_000_000) if is_ts else int(self.window_seconds)
        if self.tie_cols:
            # full (ts, *tie_cols) in-group order so first/last pick a
            # deterministic peer among equal timestamps
            from nvtabular_ray.functions.grouped_np import group_multi_order

            order = group_multi_order(table, gid, self.sort_cols)
        else:
            order = group_time_order(gid, ts)
        ts_k, gid_k = (ts, gid) if order is None else (ts[order], gid[order])
        bounds_fn = (
            grouped_window_bounds if self.direction == "trailing" else grouped_window_bounds_leading
        )
        bounds_cache: list = []

        def get_bounds():
            if not bounds_cache:
                bounds_cache.append(bounds_fn(ts_k, gid_k, window))
            return bounds_cache[0]

        def run_float(vals, f_aggs):
            # shared memoized bounds: with distinct + float aggs (or
            # several value columns) the two searchsorteds run once, not
            # once per kernel family per column
            return _agg_over_bounds(vals, *get_bounds(), f_aggs)

        out = {}
        for c in self._value_cols(col_selector):
            res = _column_window_results(
                table.column(c), order, self.aggs, gid_k, get_bounds, run_float
            )
            for a in self.aggs:
                arr = res[a]
                if order is not None:
                    back = np.empty(len(arr), arr.dtype)
                    back[order] = arr
                    arr = back
                out[self._out_name(c, a)] = pa.array(
                    arr.astype(np.int64) if a in ("count", "distinct") else arr.astype(np.float64)
                )
        return pa.table(out)


class ExpandingAgg(Operator):
    """Cumulative per-entity aggregates over all STRICTLY-earlier rows of
    the entity — the unbounded trailing window ("everything known before
    this instant"). Equal-ts peers are EXCLUDED: rows at the same instant
    are simultaneous, not "known before", so including them would leak,
    and exclusion makes the result deterministic under timestamp ties
    without a secondary sort key (SQL ``RANGE BETWEEN UNBOUNDED PRECEDING
    AND CURRENT ROW EXCLUDE GROUP``). The first instant of each entity
    gets count 0 / NULL. Output ``{col}_cum_{agg}``.

    The point-in-time complement of RollingAgg's bounded windows; fuses
    into the same single bucketed (entity, ts) shuffle."""

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        ts_col: str,
        aggs=("count", "sum", "mean"),
        tie_cols: Optional[Union[str, list[str]]] = None,
    ):
        bad = [
            a
            for a in aggs
            if a not in ("count", "sum", "mean", "min", "max", "std", "var",
                         "distinct", "first", "last")
        ]
        if bad:
            raise ValueError(
                f"unsupported aggs {bad}; use "
                "count/sum/mean/min/max/std/var/distinct/first/last"
            )
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.ts_col = ts_col
        self.aggs = list(aggs)
        # "first"/"last" read the frame's edge ROWS ("first ever value",
        # "previous value with equal-ts peers excluded"); pass tie_cols
        # when timestamps can tie or the picked peer is order-dependent,
        # mirroring RollingAgg
        self.tie_cols = [tie_cols] if isinstance(tie_cols, str) else list(tie_cols or [])
        self.sort_cols = [ts_col] + self.tie_cols

    @property
    def dependencies(self):
        return self.partition_cols + [self.ts_col] + [
            c for c in self.tie_cols if c not in self.partition_cols
        ]

    def _value_cols(self, col_selector):
        return [
            c
            for c in col_selector.names
            if c not in self.partition_cols
            and c != self.ts_col
            and c not in self.tie_cols
        ]

    def _out_name(self, col: str, agg: str) -> str:
        return f"{col}_cum_{agg}"

    def column_mapping(self, col_selector):
        return {
            self._out_name(c, a): [c] for c in self._value_cols(col_selector) for a in self.aggs
        }

    def compute_output_schema(self, col_selector, input_schema):
        return {
            self._out_name(c, a): (pa.int64() if a in ("count", "distinct") else pa.float64())
            for c in self._value_cols(col_selector)
            for a in self.aggs
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        gid = group_ids_sorted(table, self.partition_cols)
        ts, _ = _ts_to_int_us(table.column(self.ts_col))
        if self.tie_cols:
            from nvtabular_ray.functions.grouped_np import group_multi_order

            order = group_multi_order(table, gid, self.sort_cols)
        else:
            order = group_time_order(gid, ts)
        ts_k, gid_k = (ts, gid) if order is None else (ts[order], gid[order])
        bounds_cache: list = []

        def get_bounds():
            if not bounds_cache:
                bounds_cache.append(grouped_expanding_bounds(ts_k, gid_k))
            return bounds_cache[0]

        starts_k = group_starts(gid_k)

        def run_float(vals, f_aggs):
            # group-local frame sums (bit-equal to SQL's UNBOUNDED
            # PRECEDING accumulator) over the shared memoized bounds
            return _agg_over_bounds(vals, *get_bounds(), f_aggs, local_starts=starts_k)

        out = {}
        for c in self._value_cols(col_selector):
            res = _column_window_results(
                table.column(c), order, self.aggs, gid_k, get_bounds, run_float
            )
            for a in self.aggs:
                arr = res[a]
                if order is not None:
                    back = np.empty(len(arr), arr.dtype)
                    back[order] = arr
                    arr = back
                out[self._out_name(c, a)] = pa.array(
                    arr.astype(np.int64) if a in ("count", "distinct") else arr.astype(np.float64)
                )
        return pa.table(out)
