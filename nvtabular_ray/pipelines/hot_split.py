"""Hot-entity splitting for ordered features (skew mitigation, north rule).

`bucketed_group_map` keeps every entity in ONE bucket — exact, but a
pathologically hot entity (a conversation with 10^8 turns at the 10^12-turn
target) lands in one reduce task: unbounded per-task memory and a straggler
that caps scaling. Salting (ops/groupby.py) fixes this for *algebraic*
aggregations only; ordered features (lag, sessions, windows, cumulative)
need the entity's timeline, which a plain salt would tear apart.

This module splits hot entities into TIME-CONTIGUOUS segments and keeps the
ordered features exact with two classic mechanisms:

- **halo replication** for bounded windows: a row within `W` of a segment
  cut is sent to both its own segment and the neighbor that needs it for
  [t-W, t] / [t, t+W] windows (flagged `__halo__`, its own outputs dropped).
  Cut spacing is enforced >= max window, so windows never reach more than
  one segment over.
- **carry folding** (a distributed prefix scan) for unbounded state: each
  segment emits a tiny summary (first/last ts, internal session breaks,
  tail/head rows for lag/lead, raw count/sum/sumsq/min/max for expanding
  aggregates); the driver folds summaries per entity in time order into
  per-segment carries (sum of breaks before, last-K values before, prefix
  aggregates before, first-K values after) and broadcasts them — O(hot
  entities x segments) state, independent of row count.

Physical plan (raw Ray tasks — the Dataset API has no hash-repartition-by-
key, same justification as partitioned.py). LOGICAL buckets (cold hash
buckets + one per hot time-segment) are decoupled from PHYSICAL partitions:
many logical buckets ride one partition (``bucket % P``) so task count is
O(P), not O(segments) — per-bucket work inside a partition is a serial
numpy slice loop, which is what makes small segments cheap:

    analyze:  distributed per-entity row counts, threshold filter applied
              INSIDE the count exchange (only hot survivors reach the
              driver) + deterministic hash-sample of hot entities' ts
              -> cut points
    exchange: split tasks route cold rows to hash buckets, hot rows to
              (entity, time-segment) buckets, replicating halos; rows land
              in P physical partitions tagged with their logical bucket
    phase A (per partition): sort by (bucket, key, ts); cold slice ->
              feature pass immediately; each hot slice -> tiny summary
    driver:   fold summaries per entity into per-segment carries
    phase B (per partition): hot slices -> feature pass with carries

Everything is deterministic (cuts from a stable hash sample; fold order is
(entity, segment)); split output == unsplit output exactly (pytest-pinned).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.functions.grouped_np import (
    _agg_over_bounds,
    dict_codes,
    distinct_over_bounds,
    group_ids_sorted,
    group_starts,
    grouped_diff,
    grouped_expanding_bounds,
    grouped_sessionize,
    grouped_window_bounds,
    grouped_window_bounds_leading,
)
from nvtabular_ray.functions.hashing import hash64_columns

HALO_COL = "__halo__"
BUCKET_COL = "__bucket__"
_US = 1_000_000
_EMPTY_SUMMARY = {"n": 0, "first_ts": None, "last_ts": None,
                  "breaks": {}, "tail": {}, "head": {}, "exp": {},
                  "bf_last": {}, "bf_first": {}, "ctx_tail": {},
                  "sh_tail": {}, "sh_head": {}, "lw": {}, "ewma": {},
                  "sess_open": {}, "ewma_t": {}}


# --------------------------------------------------------------------------
# spec handling
# --------------------------------------------------------------------------


def _spec_out_names(spec: dict) -> list[str]:
    k = spec["kind"]
    if k == "lag":
        return [spec.get("out") or f"{spec['col']}_difference_lag_{spec['shift']}"]
    if k == "sessionize":
        return [spec.get("out") or "session_id"] + list(spec.get("emit", ()))
    if k == "rolling":
        tag = "w" if spec.get("direction", "trailing") == "trailing" else "lead"
        return [f"{spec['col']}_{tag}{int(spec['window'])}s_{a}" for a in spec["aggs"]]
    if k == "expanding":
        return [f"{spec['col']}_cum_{a}" for a in spec["aggs"]]
    if k == "backfill":
        return [spec.get("out") or f"{spec['col']}_filled"]
    if k == "rank":
        return [spec.get("out") or spec.get("method", "row_number")]
    if k == "context":
        return [spec.get("out") or f"{spec['col']}_ctx{int(spec['k'])}"]
    if k == "shift":
        return [spec.get("out") or f"{spec['col']}_shift_{spec['shift']}"]
    if k == "last_where":
        return [spec.get("out") or f"{spec['col']}_last_where"]
    if k == "ewma":
        return [spec.get("out") or f"{spec['col']}_ewma"]
    raise ValueError(f"unknown spec kind {k!r}")


def _validate_specs(specs: list[dict]):
    for s in specs:
        names = _spec_out_names(s)  # raises on unknown kind
        if s["kind"] in ("rolling", "expanding"):
            # bounded-window "distinct" is halo-exact, so rolling supports
            # it; EXPANDING distinct cannot fold through scalar carries (the
            # carry would be the unbounded set of values already seen)
            # rolling additionally supports distinct (bounded windows are
            # halo-exact) and first/last (the frame row is always inside
            # [segment - halo, segment + halo]); expanding first/last would
            # need a carried boundary row — unsplit-only for now
            ok = ("count", "sum", "mean", "min", "max", "std", "var") + (
                ("distinct", "first", "last") if s["kind"] == "rolling" else ()
            )
            bad = [a for a in s["aggs"] if a not in ok]
            if bad:
                raise ValueError(f"unsupported aggs {bad} in {s}")
        if s["kind"] == "rolling" and s.get("direction", "trailing") not in ("trailing", "leading"):
            # a typo'd direction must not silently dispatch to the leading
            # (future-looking) kernel — that is temporal leakage
            raise ValueError(f"rolling direction must be trailing/leading: {s}")
        if s["kind"] == "backfill" and s.get("direction", "forward") not in ("forward", "backward"):
            raise ValueError(f"backfill direction must be forward/backward: {s}")
        if s["kind"] == "context" and int(s["k"]) < 1:
            raise ValueError(f"context k must be >= 1: {s}")
        if s["kind"] == "rank":
            m = s.get("method", "row_number")
            # dense_rank is unsplit-only (ops.GroupRank): a tie group could
            # straddle a cut, and the carry would need the boundary tuple
            if m not in ("row_number", "percent_rank", "ntile"):
                raise ValueError(f"rank method must be row_number|percent_rank|ntile: {s}")
            if m == "ntile" and int(s.get("n") or 0) < 1:
                raise ValueError(f"ntile needs n >= 1: {s}")
        if s["kind"] == "sessionize":
            bad = [e for e in s.get("emit", ())
                   if e not in ("turn_in_session", "sec_since_session_start")]
            if bad:
                raise ValueError(f"unknown sessionize emit features {bad}")
        if s["kind"] == "shift" and int(s["shift"]) == 0:
            raise ValueError(f"shift=0 is the identity: {s}")
        if s["kind"] == "ewma":
            if ("alpha" in s) == ("halflife" in s):
                raise ValueError(f"ewma spec needs exactly one of alpha/halflife: {s}")
            if "halflife" in s:
                if float(s["halflife"]) <= 0:
                    raise ValueError(f"ewma halflife must be positive: {s}")
                continue  # time-decay mode: (num, den, t_ref) carry below
            a = float(s["alpha"])
            if not (0.0 < a <= 1.0):
                raise ValueError(f"ewma alpha must be in (0, 1]: {s}")
            if s.get("adjust", False):
                # the carry is Markov (one scalar per entity) only for the
                # adjust=False recurrence; adjust=True state is a weight
                # PAIR whose cross-segment fold is a different algebra —
                # use ops.Ewma unsplit for adjust=True
                raise ValueError("hot-split ewma supports adjust=False only")
        del names


def _max_windows_us(specs: list[dict], is_ts: bool) -> tuple[int, int]:
    """(max trailing window, max leading window) in ts units."""
    scale = _US if is_ts else 1
    wt = wl = 0
    for s in specs:
        if s["kind"] == "rolling":
            w = int(s["window"] * scale)
            if s.get("direction", "trailing") == "trailing":
                wt = max(wt, w)
            else:
                wl = max(wl, w)
    return wt, wl


def _lag_cols(specs: list[dict]) -> tuple[dict, dict]:
    """({col: max positive shift}, {col: max lead depth})."""
    tail: dict[str, int] = {}
    head: dict[str, int] = {}
    for s in specs:
        if s["kind"] == "lag":
            k = int(s["shift"])
            if k > 0:
                tail[s["col"]] = max(tail.get(s["col"], 0), k)
            elif k < 0:
                head[s["col"]] = max(head.get(s["col"], 0), -k)
    return tail, head


def _session_emit_cols(
    ts: np.ndarray,
    start_of: np.ndarray,
    emit,
    is_ts: bool,
    carry_rows: int = 0,
    carry_start=None,
) -> dict:
    """Within-session position features from per-row session-start indices.
    ``start_of[i] == -1`` marks rows continuing a CARRIED-over open session
    (hot segments): they use ``carry_rows``/``carry_start`` instead."""
    n = len(ts)
    out: dict = {}
    in_carry = start_of < 0
    safe = np.clip(start_of, 0, max(n - 1, 0))
    if "turn_in_session" in emit:
        turn = np.arange(n, dtype=np.int64) - safe
        if in_carry.any():
            # carried rows are a prefix of the segment
            turn[in_carry] = carry_rows + np.arange(int(in_carry.sum()), dtype=np.int64)
        out["turn_in_session"] = turn
    if "sec_since_session_start" in emit:
        el = (ts - ts[safe]).astype(np.float64)
        if in_carry.any():
            cs = carry_start if carry_start is not None else (ts[0] if n else 0)
            el[in_carry] = (ts[in_carry] - cs).astype(np.float64)
        if is_ts:
            el = el / 1_000_000.0
        out["sec_since_session_start"] = el
    return out


def _shift_cols(specs: list[dict]) -> tuple[dict, dict]:
    """Raw-shift carries: ({col: max lag depth}, {col: max lead depth})
    — dtype-preserving, so carried as Python value lists (ctx_tail
    precedent), unlike _lag_cols' float64 diff tails."""
    tail: dict[str, int] = {}
    head: dict[str, int] = {}
    for s in specs:
        if s["kind"] == "shift":
            k = int(s["shift"])
            if k > 0:
                tail[s["col"]] = max(tail.get(s["col"], 0), k)
            else:
                head[s["col"]] = max(head.get(s["col"], 0), -k)
    return tail, head


def _shift_take_indices(gid: np.ndarray, k: int) -> pa.Array:
    """Null-masked int64 take indices for a raw shift of ``k`` over
    (key, sort)-ordered rows with change-point gids (ops/shift.py kernel)."""
    n = len(gid)
    src = np.arange(n, dtype=np.int64) - k
    inside = (src >= 0) & (src < n)
    valid = inside & (gid[np.clip(src, 0, n - 1)] == gid)
    return pa.array(np.clip(src, 0, None), pa.int64(), mask=~valid)


def _last_where_indices(
    gid: np.ndarray, cond: np.ndarray, include_current: bool
) -> tuple[pa.Array, np.ndarray]:
    """(null-masked take indices, no-match-yet mask) for last-matching-row
    lookup over sorted gids (ops/last_where.py cummax kernel)."""
    n = len(gid)
    pos = np.arange(n, dtype=np.int64)
    enc = np.where(cond, gid * n + pos, np.int64(-1))
    cm = np.maximum.accumulate(enc)
    if not include_current:
        cm = np.concatenate([[np.int64(-1)], cm[:-1]]) if n else cm
    valid = (cm >= 0) & (cm // n == gid)
    idx = pa.array(np.clip(cm % np.maximum(n, 1), 0, None), pa.int64(), mask=~valid)
    return idx, ~valid


def _ewma_plain(vals: np.ndarray, gser, alpha: float) -> np.ndarray:
    """pandas Cython grouped ewm (adjust=False) over gid-sorted values."""
    import pandas as _pd

    return (
        _pd.Series(vals).groupby(gser).ewm(alpha=alpha, adjust=False).mean().to_numpy()
    )


def _exp_cols(specs: list[dict]) -> list[str]:
    return sorted({s["col"] for s in specs if s["kind"] == "expanding"})


def _bf_cols(specs: list[dict]) -> list[str]:
    return sorted({s["col"] for s in specs if s["kind"] == "backfill"})


# --------------------------------------------------------------------------
# analyze: entity counts + cut points for hot entities
# --------------------------------------------------------------------------


def _hot_entity_counts(ds, key: str, threshold: int):
    """Per-entity row counts, FILTERED to entities above ``threshold``
    inside the distributed exchange — the driver only ever sees the hot
    survivors (at 10^12 rows the full per-entity count table is itself
    big data; the hot set is small by definition)."""
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map

    def partial(t: pa.Table) -> pa.Table:
        # CountOptions(mode="all"): the default only counts VALID values,
        # which makes a null-keyed group report n=0 — a hot null entity
        # would silently bypass the skew guard it was asked for
        res = t.select([key]).group_by([key], use_threads=False).aggregate(
            [(key, "count", pc.CountOptions(mode="all"))]
        )
        # select by NAME before the positional rename: aggregate()'s key
        # column position is pyarrow-version-dependent
        return res.select([key, f"{key}_count"]).rename_columns([key, "n"])

    def per_bucket(t: pa.Table) -> pa.Table:
        res = t.group_by([key], use_threads=False).aggregate([("n", "sum")])
        res = res.select([key, "n_sum"]).rename_columns([key, "n"])
        return res.filter(pc.greater(res.column("n"), threshold))

    partials = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    hot = bucketed_group_map(partials, [key], [], per_bucket, presort=False)
    batches = list(hot.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not batches:
        import pandas as pd

        return pd.DataFrame({key: [], "n": []})
    out = pa.concat_tables(batches, promote_options="default")
    return out.sort_by([(key, "ascending")]).to_pandas()


def _ts_to_us_np(arr: pa.ChunkedArray) -> tuple[np.ndarray, bool]:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_timestamp(a.type):
        return pc.cast(a, pa.timestamp("us")).cast(pa.int64()).to_numpy(), True
    return pc.cast(a, pa.int64()).to_numpy(zero_copy_only=False), False


def _sample_hot_ts(ds, key: str, ts_col: str, hot_counts, keys_arr: pa.Array,
                   sample_per_entity: int = 2048):
    """Deterministic per-entity ts sample: keep a row iff
    hash64(key, ts) % 2^20 < rate * 2^20 with rate sized from the entity's
    known row count. Output is driver-small by construction.

    ``keys_arr`` must carry the key column's exact Arrow type (index_in is
    type-strict for e.g. int32 keys)."""
    rates = {
        k: min(1.0, sample_per_entity / max(1, int(n)))
        for k, n in zip(hot_counts[key].tolist(), hot_counts["n"].tolist())
    }
    rate_arr = pa.array([rates[k] for k in hot_counts[key].tolist()], pa.float64())

    def thin(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(key).combine_chunks(), keys_arr)
        present = pc.is_valid(idx)
        if not pc.any(present).as_py():
            return pa.table({key: pa.array([], t.schema.field(key).type),
                             ts_col: pa.array([], t.schema.field(ts_col).type)})
        t2 = t.filter(present).select([key, ts_col])
        idx2 = pc.index_in(t2.column(key).combine_chunks(), keys_arr)
        rate = pc.take(rate_arr, idx2).to_numpy(zero_copy_only=False)
        h = hash64_columns(t2, [key, ts_col]) % np.uint64(1 << 20)
        keep = h.astype(np.float64) < rate * float(1 << 20)
        return t2.filter(pa.array(keep))

    sampled = ds.select_columns([key, ts_col]).map_batches(
        thin, batch_format="pyarrow", zero_copy_batch=True
    )
    return pa.concat_tables(
        [b for b in sampled.iter_batches(batch_size=None, batch_format="pyarrow")],
        promote_options="default",
    )


def _choose_cuts(sample_ts_us: np.ndarray, n_rows: int, target_seg_rows: int, min_spacing: int):
    """Cut points from sample quantiles; enforce >= min_spacing (max window)
    between cuts so windows never span two cuts. Returns int64 array
    (possibly empty -> entity stays unsplit)."""
    m = int(np.ceil(n_rows / max(1, target_seg_rows)))
    if m < 2 or len(sample_ts_us) < 2:
        return np.empty(0, np.int64)
    qs = np.quantile(np.sort(sample_ts_us), np.linspace(0, 1, m + 1)[1:-1]).astype(np.int64)
    out = []
    lo = int(sample_ts_us.min())
    for c in qs:
        c = int(c)
        if c - (out[-1] if out else lo) >= min_spacing:
            out.append(c)
    return np.asarray(out, np.int64)


# --------------------------------------------------------------------------
# exchange
# --------------------------------------------------------------------------


def _split_one(block: pa.Table, key: str, ts_col: str, B: int, total: int, P: int, hot: dict):
    """Route rows: cold -> hash bucket in [0, B); hot -> B + base + segment;
    replicate halo rows to the neighbor segment that needs them for bounded
    windows. Returns ``P`` physical shards (logical bucket = ``bucket % P``
    is tagged on every row as BUCKET_COL for in-partition slicing)."""
    n = block.num_rows
    h = (hash64_columns(block, [key]) % np.uint64(B)).astype(np.int64)
    bucket = h
    halo = np.zeros(n, dtype=np.int8)
    extra_rows: list[np.ndarray] = []
    extra_buckets: list[np.ndarray] = []

    if hot["keys"] is not None and len(hot["keys"]):
        kidx = pc.index_in(block.column(key).combine_chunks(), hot["keys"])
        kn = kidx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us, _ = _ts_to_us_np(block.column(ts_col))
        halo_col = hot.get("halo_col")  # only rows with this int8 col == 1
        halo_ok = (                     # may replicate (e.g. join right side)
            pc.equal(block.column(halo_col).combine_chunks(), 1)
            .to_numpy(zero_copy_only=False)
            if halo_col
            else None
        )
        # group rows by hot-entity index via one stable sort (no per-entity
        # full scans — many small hot entities would make that quadratic)
        pos = np.flatnonzero(kn >= 0)
        order = pos[np.argsort(kn[pos], kind="stable")]
        ks = kn[order]
        run_starts = (
            np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1, len(ks)]
            if len(ks)
            else np.zeros(1, np.int64)
        )
        for si in range(len(run_starts) - 1):
            rows = order[run_starts[si]:run_starts[si + 1]]
            i = int(ks[run_starts[si]])
            cuts = hot["cuts"][i]
            base = B + int(hot["base"][i])
            seg = np.searchsorted(cuts, ts_us[rows], side="right")
            bucket[rows] = base + seg
            if len(cuts):
                wt, wl = hot["wt"], hot["wl"]
                if wt > 0:
                    has_next = seg < len(cuts)
                    nxt = cuts[np.minimum(seg, len(cuts) - 1)]
                    m = has_next & (ts_us[rows] >= nxt - wt)
                    if halo_ok is not None:
                        m &= halo_ok[rows]
                    extra_rows.append(rows[m])
                    extra_buckets.append(base + seg[m] + 1)
                if wl > 0:
                    has_prev = seg > 0
                    prv = cuts[np.maximum(seg, 1) - 1]
                    m = has_prev & (ts_us[rows] <= prv + wl)
                    if halo_ok is not None:
                        m &= halo_ok[rows]
                    extra_rows.append(rows[m])
                    extra_buckets.append(base + seg[m] - 1)

    body = block.append_column(HALO_COL, pa.array(halo, pa.int8()))
    tables = [body]
    buckets = [bucket]
    if extra_rows:
        er = np.concatenate(extra_rows)
        eb = np.concatenate(extra_buckets)
        rep = block.take(pa.array(er)).append_column(
            HALO_COL, pa.array(np.ones(len(er), np.int8))
        )
        tables.append(rep)
        buckets.append(eb)
    allt = pa.concat_tables(tables, promote_options="default")
    allb = np.concatenate(buckets)
    allt = allt.append_column(BUCKET_COL, pa.array(allb, pa.int64()))
    phys = allb % P
    order = np.argsort(phys, kind="stable")
    srt = allt.take(pa.array(order))
    bounds = np.searchsorted(phys[order], np.arange(P + 1))
    return tuple(srt.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P))


# --------------------------------------------------------------------------
# per-bucket compute
# --------------------------------------------------------------------------


def _rolling_results(t: pa.Table, s: dict, vals, ts_us, gid, scale) -> dict:
    """Window bounds computed ONCE, shared by the float aggs
    (_agg_over_bounds) and "distinct" (distinct_over_bounds, which needs
    the RAW column, not the float cast — the value may be a string).
    Shared by the cold and hot compute paths; ``vals`` is the caller's
    lazy float-cast closure, only touched when a float agg exists."""
    dirn = s.get("direction", "trailing")
    bf = grouped_window_bounds if dirn == "trailing" else grouped_window_bounds_leading
    w_, e_ = bf(ts_us, gid, int(s["window"] * scale))
    f_aggs = [a for a in s["aggs"] if a != "distinct"]
    res = _agg_over_bounds(vals(s["col"]), w_, e_, f_aggs) if f_aggs else {}
    if "distinct" in s["aggs"]:
        codes, cvalid = dict_codes(t.column(s["col"]))
        res["distinct"] = distinct_over_bounds(codes, cvalid, w_, e_, gid)
    return res


def _compute_cold(t: pa.Table, cfg: dict) -> pa.Table:
    """Multi-entity bucket: the plain kernels over (key, ts)-sorted rows."""
    t = t.drop_columns([HALO_COL])
    gid = group_ids_sorted(t, [cfg["key"]])
    ts_us, is_ts = _ts_to_us_np(t.column(cfg["ts_col"]))
    scale = _US if is_ts else 1
    vals_cache: dict[str, np.ndarray] = {}

    def vals(col: str) -> np.ndarray:
        if col not in vals_cache:
            vals_cache[col] = (
                t.column(col).combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            )
        return vals_cache[col]

    for s in cfg["specs"]:
        names = _spec_out_names(s)
        if s["kind"] == "lag":
            d = grouped_diff(vals(s["col"]), gid, int(s["shift"])).astype(np.float32)
            t = t.append_column(names[0], pa.array(d, pa.float32(), mask=np.isnan(d)))
        elif s["kind"] == "sessionize":
            sid = grouped_sessionize(ts_us, gid, int(s["gap"] * scale))
            t = t.append_column(names[0], pa.array(sid, pa.int64()))
            emit = s.get("emit", ())
            if emit:
                n_r = len(sid)
                new_sess = np.ones(n_r, dtype=bool)
                if n_r:
                    new_sess[1:] = (gid[1:] != gid[:-1]) | (sid[1:] != sid[:-1])
                starts = np.flatnonzero(new_sess)
                start_of = np.repeat(starts, np.diff(np.r_[starts, n_r]))
                res = _session_emit_cols(ts_us, start_of, emit, scale == _US)
                for e in emit:
                    t = t.append_column(e, pa.array(res[e]))
        elif s["kind"] == "rolling":
            res = _rolling_results(t, s, vals, ts_us, gid, scale)
            for name, a in zip(names, s["aggs"]):
                arr = res[a]
                t = t.append_column(
                    name,
                    pa.array(arr.astype(np.int64) if a in ("count", "distinct") else arr),
                )
        elif s["kind"] == "expanding":
            w, end = grouped_expanding_bounds(ts_us, gid)
            # local_starts: frame sums accumulate group-locally, bit-equal
            # to the fixed ExpandingAgg default plan (a global-cumsum
            # difference drifts 1 ulp across a large earlier entity)
            res = _agg_over_bounds(
                vals(s["col"]), w, end, s["aggs"], local_starts=group_starts(gid)
            )
            for name, a in zip(names, s["aggs"]):
                arr = res[a]
                t = t.append_column(
                    name, pa.array(arr.astype(np.int64) if a == "count" else arr)
                )
        elif s["kind"] == "backfill":
            from nvtabular_ray.functions.grouped_np import grouped_fill_indices

            col = t.column(s["col"]).combine_chunks()
            valid = ~pc.is_null(col, nan_is_null=True).to_numpy(zero_copy_only=False)
            gather, ok = grouped_fill_indices(valid, gid, s.get("direction", "forward"))
            filled = pc.take(col, pa.array(gather, pa.int64(), mask=~ok))
            t = t.append_column(names[0], filled)
        elif s["kind"] == "rank":
            from nvtabular_ray.ops.rank import rank_from_positions

            starts = group_starts(gid)
            counts = np.diff(np.r_[starts, len(gid)])
            gstart = np.repeat(starts, counts)
            rn = np.arange(len(gid), dtype=np.int64) - gstart + 1
            r = rank_from_positions(
                rn, np.repeat(counts, counts), s.get("method", "row_number"), s.get("n")
            )
            t = t.append_column(names[0], pa.array(r))
        elif s["kind"] == "context":
            from nvtabular_ray.ops.context import concat_prev_k, render_pieces

            rendered = render_pieces(
                t, s["col"], s.get("prefix_col"), s.get("prefix_sep", ": ")
            )
            starts = group_starts(gid)
            gstart = np.repeat(starts, np.diff(np.r_[starts, len(gid)]))
            t = t.append_column(
                names[0],
                concat_prev_k(rendered, gstart, int(s["k"]), s.get("sep", "\n")),
            )
        elif s["kind"] == "shift":
            idx_sh = _shift_take_indices(gid, int(s["shift"]))
            t = t.append_column(
                names[0], pc.take(t.column(s["col"]).combine_chunks(), idx_sh)
            )
        elif s["kind"] == "last_where":
            cond = pc.fill_null(
                t.column(s["cond"]).combine_chunks().cast(pa.bool_()), False
            ).to_numpy(zero_copy_only=False)
            idx_lw, _ = _last_where_indices(gid, cond, bool(s.get("include_current")))
            t = t.append_column(
                names[0], pc.take(t.column(s["col"]).combine_chunks(), idx_lw)
            )
        elif s["kind"] == "ewma":
            if "halflife" in s:
                from nvtabular_ray.ops.ewma import ewma_time_decay

                tau = float(s["halflife"]) * scale / np.log(2.0)
                ew = ewma_time_decay(
                    vals(s["col"]), ts_us.astype(np.float64), gid, tau
                )
            else:
                import pandas as _pd

                ew = _ewma_plain(vals(s["col"]), _pd.Series(gid), float(s["alpha"]))
            t = t.append_column(names[0], pa.array(ew, pa.float64(), from_pandas=True))
    return t


def _summarize_segment(t: pa.Table, cfg: dict) -> dict:
    """Tiny summary of a hot segment's NON-halo rows (sorted by ts)."""
    body = t.filter(pc.equal(t.column(HALO_COL), 0))
    ts_us, is_ts = _ts_to_us_np(body.column(cfg["ts_col"]))
    scale = _US if is_ts else 1
    out = {"n": body.num_rows, "first_ts": None, "last_ts": None,
           "breaks": {}, "tail": {}, "head": {}, "exp": {},
           "bf_last": {}, "bf_first": {}, "ctx_tail": {},
           "sh_tail": {}, "sh_head": {}, "lw": {}, "ewma": {},
           "ewma_t": {}, "sess_open": {}}
    if body.num_rows == 0:
        return out
    out["first_ts"] = int(ts_us[0])
    out["last_ts"] = int(ts_us[-1])
    for i, s in enumerate(cfg["specs"]):
        if s["kind"] == "sessionize":
            gap = int(s["gap"] * scale)
            brk_pos = np.flatnonzero(np.diff(ts_us) > gap) + 1  # row starting a session
            out["breaks"][i] = len(brk_pos)
            if s.get("emit"):
                # open-session fold state: rows after the segment's LAST
                # in-segment session start, and that start's ts
                if len(brk_pos):
                    out.setdefault("sess_open", {})[i] = (
                        int(body.num_rows - brk_pos[-1]),
                        int(ts_us[brk_pos[-1]]),
                    )
                else:
                    out.setdefault("sess_open", {})[i] = None  # no in-segment break
        elif s["kind"] == "context":
            from nvtabular_ray.ops.context import render_pieces

            k = int(s["k"])
            rendered = render_pieces(
                body, s["col"], s.get("prefix_col"), s.get("prefix_sep", ": ")
            )
            out["ctx_tail"][i] = rendered.slice(max(0, len(rendered) - k)).to_pylist()
        elif s["kind"] == "last_where":
            cond = pc.fill_null(
                body.column(s["cond"]).combine_chunks().cast(pa.bool_()), False
            ).to_numpy(zero_copy_only=False)
            nz = np.flatnonzero(cond)
            has = len(nz) > 0
            # the matched ROW's value, null included (row-level semantics,
            # ops/last_where.py docstring)
            out["lw"][i] = (
                has,
                body.column(s["col"])[int(nz[-1])].as_py() if has else None,
            )
        elif s["kind"] == "ewma" and "halflife" in s:
            from nvtabular_ray.ops.ewma import _ewma_time_chunked

            v = (
                body.column(s["col"])
                .combine_chunks()
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            tau = float(s["halflife"]) * scale / np.log(2.0)
            num, den = _ewma_time_chunked(v, ts_us.astype(np.float64), tau)
            # zero-carry exit state; linear in the carried (num, den), so
            # the fold transports it with one exp decay (NaNs are fine —
            # they contribute nothing and the state stays linear)
            out["ewma_t"][i] = (float(num[-1]), float(den[-1]), int(ts_us[-1]))
        elif s["kind"] == "ewma":
            v = (
                body.column(s["col"])
                .combine_chunks()
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            if np.isnan(v).any():
                raise ValueError(
                    "hot-split ewma requires a non-null value column: a "
                    "null inside a hot entity makes the carry depend on "
                    "pandas' absolute-position NaN weighting, which does "
                    "not fold across segments — FillMissing upstream or "
                    "use ops.Ewma without hot_threshold"
                )
            a = float(s["alpha"])
            import pandas as _pd

            # plain = pandas semantics from segment start (y0 = x0): the
            # entity's FIRST segment state. seeded-zero = the recurrence
            # applied to every row from y=0, so a later segment's exit
            # state is the affine map  y_out = (1-a)^n * y_in + B  (the
            # recurrence is linear in the carried state).
            plain = _pd.Series(v).ewm(alpha=a, adjust=False).mean().iloc[-1]
            seeded = (
                _pd.Series(np.concatenate([[0.0], v]))
                .ewm(alpha=a, adjust=False)
                .mean()
                .iloc[-1]
            )
            out["ewma"][i] = (len(v), float(plain), float(seeded))
    sh_tail, sh_head = _shift_cols(cfg["specs"])
    for col, k in sh_tail.items():
        c = body.column(col)
        out["sh_tail"][col] = c.slice(max(0, len(c) - k)).to_pylist()
    for col, k in sh_head.items():
        out["sh_head"][col] = body.column(col).slice(0, k).to_pylist()
    tail, head = _lag_cols(cfg["specs"])
    for col, k in tail.items():
        v = body.column(col).combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        out["tail"][col] = v[-k:].copy()
    for col, k in head.items():
        v = body.column(col).combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        out["head"][col] = v[:k].copy()
    for col in _bf_cols(cfg["specs"]):
        c = body.column(col).combine_chunks()
        nz = np.flatnonzero(
            ~pc.is_null(c, nan_is_null=True).to_numpy(zero_copy_only=False)
        )
        has = len(nz) > 0
        out["bf_last"][col] = (has, c[int(nz[-1])].as_py() if has else None)
        out["bf_first"][col] = (has, c[int(nz[0])].as_py() if has else None)
    for col in _exp_cols(cfg["specs"]):
        v = body.column(col).combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        ok = v[~np.isnan(v)]
        # (count, raw sum, M2) — M2 = sum((x - mean)^2), computed centered
        # so the carried moments stay stable for large-mean data (the raw
        # sumsq would cancel catastrophically against sum^2/n downstream)
        m2 = float(((ok - ok.mean()) ** 2).sum()) if len(ok) else 0.0
        out["exp"][col] = (
            int(len(ok)),
            float(ok.sum()) if len(ok) else 0.0,
            m2,
            float(ok.min()) if len(ok) else np.nan,
            float(ok.max()) if len(ok) else np.nan,
        )
    return out


def _fold_carries(summaries: list[dict], cfg: dict) -> list[dict]:
    """Per-entity fold of segment summaries (in segment order) into
    per-segment carry-in state. O(segments); runs on the driver."""
    tail_cols, head_cols = _lag_cols(cfg["specs"])
    exp_cols = _exp_cols(cfg["specs"])
    bf_cols = _bf_cols(cfg["specs"])
    m = len(summaries)
    carries = [dict() for _ in range(m)]

    # forward state
    breaks_before = {i: 0 for i, s in enumerate(cfg["specs"]) if s["kind"] == "sessionize"}
    prev_last_ts = None
    run_tail = {c: np.empty(0, np.float64) for c in tail_cols}
    run_exp = {c: (0, 0.0, 0.0, np.nan, np.nan) for c in exp_cols}
    run_bf_last = {c: (False, None) for c in bf_cols}
    run_rows = 0
    rank_total = sum(sm["n"] for sm in summaries)
    ctx_specs = {
        i: int(s["k"]) for i, s in enumerate(cfg["specs"]) if s["kind"] == "context"
    }
    run_ctx = {i: [] for i in ctx_specs}
    sh_tail_cols, sh_head_cols = _shift_cols(cfg["specs"])
    run_sh_tail = {c: [] for c in sh_tail_cols}
    lw_specs = [i for i, s in enumerate(cfg["specs"]) if s["kind"] == "last_where"]
    run_lw = {i: (False, None) for i in lw_specs}
    ewma_specs = {
        i: float(s["alpha"])
        for i, s in enumerate(cfg["specs"])
        if s["kind"] == "ewma" and "alpha" in s
    }
    run_ewma = {i: None for i in ewma_specs}  # None = no prior state
    ewma_t_specs = {
        i: float(s["halflife"])
        for i, s in enumerate(cfg["specs"])
        if s["kind"] == "ewma" and "halflife" in s
    }
    run_ewma_t = {i: None for i in ewma_t_specs}  # (num, den, t_ref)
    sess_emit_specs = [
        i for i, s in enumerate(cfg["specs"])
        if s["kind"] == "sessionize" and s.get("emit")
    ]
    # (rows in the open session so far, that session's start ts)
    run_sess = {i: (0, None) for i in sess_emit_specs}
    ts_scale = _US if cfg["is_ts"] else 1
    for j, sm in enumerate(summaries):
        carries[j]["prev_last_ts"] = prev_last_ts
        carries[j]["breaks_before"] = dict(breaks_before)
        carries[j]["tail"] = {c: run_tail[c][-k:].copy() for c, k in tail_cols.items()}
        carries[j]["exp"] = dict(run_exp)
        carries[j]["bf_last"] = dict(run_bf_last)
        carries[j]["rows_before"] = run_rows
        carries[j]["rank_total"] = rank_total
        carries[j]["ctx"] = {i: list(run_ctx[i]) for i in ctx_specs}
        carries[j]["sh_tail"] = {
            c: list(run_sh_tail[c])[-k:] for c, k in sh_tail_cols.items()
        }
        carries[j]["lw"] = dict(run_lw)
        carries[j]["ewma_y"] = dict(run_ewma)
        carries[j]["ewma_t_y"] = dict(run_ewma_t)
        carries[j]["sess_open"] = dict(run_sess)
        run_rows += sm["n"]
        for i, k in ctx_specs.items():
            run_ctx[i] = (run_ctx[i] + sm["ctx_tail"].get(i, []))[-k:]
        for c, k in sh_tail_cols.items():
            run_sh_tail[c] = (run_sh_tail[c] + sm["sh_tail"].get(c, []))[-k:]
        for i in lw_specs:
            has, val = sm["lw"].get(i, (False, None))
            if has:
                run_lw[i] = (has, val)
        for i, a in ewma_specs.items():
            e = sm["ewma"].get(i)
            if e is not None:
                n_seg, plain, seeded = e
                y = run_ewma[i]
                run_ewma[i] = plain if y is None else seeded + (1.0 - a) ** n_seg * y
        for i, hl in ewma_t_specs.items():
            e = sm.get("ewma_t", {}).get(i)
            if e is not None:
                num_e, den_e, t_last = e
                tau = hl * ts_scale / np.log(2.0)
                prev = run_ewma_t[i]
                if prev is None:
                    run_ewma_t[i] = (num_e, den_e, t_last)
                else:
                    pn, pd_, pt = prev
                    d = np.exp((pt - t_last) / tau)
                    run_ewma_t[i] = (num_e + d * pn, den_e + d * pd_, t_last)
        if sm["n"] == 0:
            continue
        for c in bf_cols:
            has, val = sm["bf_last"].get(c, (False, None))
            if has:
                run_bf_last[c] = (has, val)
        # advance
        for i, s in enumerate(cfg["specs"]):
            if s["kind"] != "sessionize":
                continue
            gap = int(s["gap"] * ts_scale)
            first_flag = 1 if prev_last_ts is None else int(sm["first_ts"] - prev_last_ts > gap)
            breaks_before[i] += first_flag + sm["breaks"].get(i, 0)
            if i in run_sess:
                open_rows, open_start = run_sess[i]
                if first_flag:
                    open_rows, open_start = 0, sm["first_ts"]
                elif open_start is None:
                    open_start = sm["first_ts"]
                seg_open = sm.get("sess_open", {}).get(i)
                if seg_open is not None:  # in-segment break: session restarts
                    run_sess[i] = seg_open
                else:
                    run_sess[i] = (open_rows + sm["n"], open_start)
        prev_last_ts = sm["last_ts"]
        for c in tail_cols:
            run_tail[c] = np.concatenate([run_tail[c], sm["tail"].get(c, [])])[-tail_cols[c]:]
        for c in exp_cols:
            c0, s0, m20, mn0, mx0 = run_exp[c]
            c1, s1, m21, mn1, mx1 = sm["exp"][c]
            n = c0 + c1
            # Chan parallel-variance combine of (count, sum, M2) pairs
            if c0 and c1:
                delta = s1 / c1 - s0 / c0
                m2 = m20 + m21 + delta * delta * c0 * c1 / n
            else:
                m2 = m20 + m21
            run_exp[c] = (n, s0 + s1, m2, np.fmin(mn0, mn1), np.fmax(mx0, mx1))

    # backward state for leads / backward fill
    run_head = {c: np.empty(0, np.float64) for c in head_cols}
    run_sh_head = {c: [] for c in sh_head_cols}
    run_bf_first = {c: (False, None) for c in bf_cols}
    for j in range(m - 1, -1, -1):
        carries[j]["head"] = {c: run_head[c][:k].copy() for c, k in head_cols.items()}
        carries[j]["sh_head"] = {
            c: list(run_sh_head[c])[:k] for c, k in sh_head_cols.items()
        }
        carries[j]["bf_first"] = dict(run_bf_first)
        sm = summaries[j]
        if sm["n"] == 0:
            continue
        for c in head_cols:
            run_head[c] = np.concatenate([sm["head"].get(c, []), run_head[c]])[: head_cols[c]]
        for c, k in sh_head_cols.items():
            run_sh_head[c] = (sm["sh_head"].get(c, []) + run_sh_head[c])[:k]
        for c in bf_cols:
            has, val = sm["bf_first"].get(c, (False, None))
            if has:
                run_bf_first[c] = (has, val)
    return carries


def _combine_expanding(count_l, csum_l, csumsq_l, shift, min_l, max_l, carry, aggs):
    """Combine a segment's local exclusive prefix stats with the carried
    prefix over all previous segments. Local sums are CENTERED on the
    segment ``shift`` (the segment mean) and the carry holds (count, raw
    sum, M2); variance merges via Chan's parallel algorithm — both choices
    keep large-mean data exact (raw-moment algebra cancels catastrophically
    at count·mean² ≫ var, the expanding-window regime by definition)."""
    c0, s0, m20, mn0, mx0 = carry
    count = count_l + c0
    out = {}
    if "count" in aggs:
        out["count"] = count
    with np.errstate(invalid="ignore", divide="ignore"):
        sum_l = csum_l + count_l * shift  # raw local sum
        s = sum_l + s0
        if "sum" in aggs:
            out["sum"] = np.where(count > 0, s, np.nan)
        if "mean" in aggs:
            out["mean"] = np.where(count > 0, s / count, np.nan)
        if "std" in aggs or "var" in aggs:
            # local M2 from centered sums (stable), then Chan combine
            m2_l = np.where(count_l > 0, csumsq_l - csum_l * csum_l / np.maximum(count_l, 1), 0.0)
            mean_l = np.where(count_l > 0, sum_l / np.maximum(count_l, 1), 0.0)
            mean0 = s0 / c0 if c0 else 0.0
            delta = mean_l - mean0
            cross = np.where(
                (count_l > 0) & (c0 > 0),
                delta * delta * c0 * count_l / np.maximum(count, 1),
                0.0,
            )
            m2 = m20 + m2_l + cross
            var = np.where(count > 1, m2 / (count - 1), np.nan)
            var = np.where(var < 0, 0.0, var)
            if "var" in aggs:
                out["var"] = var
            if "std" in aggs:
                out["std"] = np.sqrt(var)
    if "min" in aggs:
        out["min"] = np.fmin(min_l, mn0)
    if "max" in aggs:
        out["max"] = np.fmax(max_l, mx0)
    return out


def _compute_hot(t: pa.Table, cfg: dict, carry: dict) -> pa.Table:
    """Single-entity time segment (sorted by ts, halo rows interleaved at
    the edges): bounded windows read the halos; unbounded state reads the
    carry; halo rows are dropped from the output."""
    ts_us, is_ts = _ts_to_us_np(t.column(cfg["ts_col"]))
    scale = _US if is_ts else 1
    halo = t.column(HALO_COL).to_numpy(zero_copy_only=False).astype(bool)
    idx = np.flatnonzero(~halo)
    body = t.filter(pa.array(~halo)).drop_columns([HALO_COL])
    seg_ts = ts_us[idx]
    gid_all = np.zeros(len(ts_us), np.int64)
    gid_seg = np.zeros(len(idx), np.int64)
    vals_cache: dict[str, np.ndarray] = {}

    def vals(col: str) -> np.ndarray:
        if col not in vals_cache:
            vals_cache[col] = (
                t.column(col).combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
            )
        return vals_cache[col]

    for spec_i, s in enumerate(cfg["specs"]):
        names = _spec_out_names(s)
        if s["kind"] == "lag":
            k = int(s["shift"])
            v = vals(s["col"])[idx]
            n = len(v)
            if k > 0:
                pad = carry["tail"].get(s["col"], np.empty(0, np.float64))
                p = np.full(k, np.nan)
                if len(pad):
                    p[k - len(pad):] = pad[-k:]
                ext = np.concatenate([p, v])
                d = (v - ext[:n]).astype(np.float32)
            else:
                kk = -k
                nxt = carry["head"].get(s["col"], np.empty(0, np.float64))
                p = np.full(kk, np.nan)
                p[: len(nxt)] = nxt[:kk]
                ext = np.concatenate([v, p])
                d = (v - ext[kk:]).astype(np.float32)
            body = body.append_column(names[0], pa.array(d, pa.float32(), mask=np.isnan(d)))
        elif s["kind"] == "sessionize":
            gap = int(s["gap"] * scale)
            nb = len(idx)
            new_s = np.ones(nb, dtype=np.int64)
            if nb:
                new_s[1:] = (np.diff(seg_ts) > gap).astype(np.int64)
                prev = carry["prev_last_ts"]
                if prev is not None:
                    new_s[0] = int(seg_ts[0] - prev > gap)
            base = carry["breaks_before"].get(spec_i, 0)
            sid = base + np.cumsum(new_s) - 1
            body = body.append_column(names[0], pa.array(sid, pa.int64()))
            emit = s.get("emit", ())
            if emit:
                starts_l = np.flatnonzero(new_s)
                start_of = np.full(nb, -1, np.int64)
                if len(starts_l):
                    rep = np.repeat(
                        starts_l, np.diff(np.r_[starts_l, nb])
                    )
                    start_of[starts_l[0]:] = rep
                open_rows, open_start = carry["sess_open"].get(spec_i, (0, None))
                res = _session_emit_cols(
                    seg_ts, start_of, emit, scale == _US,
                    carry_rows=open_rows, carry_start=open_start,
                )
                for e in emit:
                    body = body.append_column(e, pa.array(res[e]))
        elif s["kind"] == "rolling":
            res = _rolling_results(t, s, vals, ts_us, gid_all, scale)
            for name, a in zip(names, s["aggs"]):
                arr = res[a][idx]
                body = body.append_column(
                    name,
                    pa.array(arr.astype(np.int64) if a in ("count", "distinct") else arr),
                )
        elif s["kind"] == "expanding":
            v = vals(s["col"])[idx]
            w, end = grouped_expanding_bounds(seg_ts, gid_seg)
            valid = ~np.isnan(v)
            cv = np.concatenate([[0], np.cumsum(valid, dtype=np.int64)])
            count_l = cv[end] - cv[w]
            # prefix sums on SEGMENT-MEAN-centered values (shift-invariant
            # stats; raw v*v cumsums cancel catastrophically at large mean)
            shift = float(np.nanmean(v)) if valid.any() else 0.0
            vc = np.where(valid, v - shift, 0.0)
            cs = np.concatenate([[0.0], np.cumsum(vc)])
            csum_l = cs[end] - cs[w]
            css = np.concatenate([[0.0], np.cumsum(vc * vc)])
            csumsq_l = css[end] - css[w]
            from nvtabular_ray.functions.grouped_np import range_min_max

            need_mm = ("min" in s["aggs"]) or ("max" in s["aggs"])
            min_l = range_min_max(v, w, end, "min") if need_mm else np.nan
            max_l = range_min_max(v, w, end, "max") if need_mm else np.nan
            res = _combine_expanding(
                count_l, csum_l, csumsq_l, shift, min_l, max_l,
                carry["exp"][s["col"]], s["aggs"]
            )
            for name, a in zip(names, s["aggs"]):
                arr = res[a]
                body = body.append_column(
                    name, pa.array(arr.astype(np.int64) if a == "count" else arr)
                )
        elif s["kind"] == "backfill":
            from nvtabular_ray.functions.grouped_np import grouped_fill_indices

            direction = s.get("direction", "forward")
            col = body.column(s["col"]).combine_chunks()
            valid = ~pc.is_null(col, nan_is_null=True).to_numpy(zero_copy_only=False)
            gather, ok = grouped_fill_indices(valid, gid_seg, direction)
            filled = pc.take(col, pa.array(gather, pa.int64(), mask=~ok))
            src = carry["bf_last"] if direction == "forward" else carry["bf_first"]
            has, val = src.get(s["col"], (False, None))
            if has:
                filled = pc.fill_null(filled, pa.scalar(val, col.type))
            body = body.append_column(names[0], filled)
        elif s["kind"] == "rank":
            from nvtabular_ray.ops.rank import rank_from_positions

            # carries: rows_before = body rows in earlier segments,
            # rank_total = the entity's TOTAL body rows (known at fold time)
            rn = carry["rows_before"] + np.arange(1, len(idx) + 1, dtype=np.int64)
            total = np.full(len(idx), carry["rank_total"], np.int64)
            r = rank_from_positions(rn, total, s.get("method", "row_number"), s.get("n"))
            body = body.append_column(names[0], pa.array(r))
        elif s["kind"] == "context":
            from nvtabular_ray.ops.context import concat_prev_k, render_pieces

            rendered = render_pieces(
                body, s["col"], s.get("prefix_col"), s.get("prefix_sep", ": ")
            )
            if isinstance(rendered, pa.ChunkedArray):
                rendered = rendered.combine_chunks()
            carried = carry["ctx"].get(spec_i, [])
            ext = pa.concat_arrays([pa.array(carried, rendered.type), rendered])
            joined = concat_prev_k(
                ext, np.zeros(len(ext), np.int64), int(s["k"]), s.get("sep", "\n")
            )
            body = body.append_column(names[0], joined.slice(len(carried)))
        elif s["kind"] == "shift":
            k = int(s["shift"])
            col = body.column(s["col"]).combine_chunks()
            nb = len(col)
            if k > 0:
                carried = carry["sh_tail"].get(s["col"], [])[-k:]
                ext = pa.concat_arrays([pa.array(carried, col.type), col])
                off = len(carried)
                src = np.arange(nb, dtype=np.int64) + off - k
                valid = src >= 0
            else:
                carried = carry["sh_head"].get(s["col"], [])[: -k]
                ext = pa.concat_arrays([col, pa.array(carried, col.type)])
                src = np.arange(nb, dtype=np.int64) - k
                valid = src < len(ext)
            idx_sh = pa.array(np.clip(src, 0, max(len(ext) - 1, 0)), pa.int64(), mask=~valid)
            body = body.append_column(names[0], pc.take(ext, idx_sh))
        elif s["kind"] == "last_where":
            cond = pc.fill_null(
                body.column(s["cond"]).combine_chunks().cast(pa.bool_()), False
            ).to_numpy(zero_copy_only=False)
            col = body.column(s["col"]).combine_chunks()
            idx_lw, no_match = _last_where_indices(
                np.zeros(len(cond), np.int64), cond, bool(s.get("include_current"))
            )
            taken = pc.take(col, idx_lw)
            has, val = carry["lw"].get(spec_i, (False, None))
            if has and no_match.any():
                # rows before the segment's first match read the carried
                # row's value (null included — row-level semantics)
                taken = pc.if_else(
                    pa.array(no_match), pa.scalar(val, col.type), taken
                )
            body = body.append_column(names[0], taken)
        elif s["kind"] == "ewma" and "halflife" in s:
            from nvtabular_ray.ops.ewma import _ewma_time_chunked

            tau = float(s["halflife"]) * scale / np.log(2.0)
            v = vals(s["col"])[idx]
            carry_t = carry["ewma_t_y"].get(spec_i)
            num, den = _ewma_time_chunked(
                v, seg_ts.astype(np.float64), tau, carry=carry_t
            )
            with np.errstate(invalid="ignore", divide="ignore"):
                ew = np.where(den > 0, num / den, np.nan)
            body = body.append_column(
                names[0], pa.array(ew, pa.float64(), from_pandas=True)
            )
        elif s["kind"] == "ewma":
            a = float(s["alpha"])
            v = (
                body.column(s["col"])
                .combine_chunks()
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            if np.isnan(v).any():
                raise ValueError(
                    "hot-split ewma requires a non-null value column "
                    "(see _summarize_segment)"
                )
            import pandas as _pd

            y_in = carry["ewma_y"].get(spec_i)
            if y_in is None:
                ew = _pd.Series(v).ewm(alpha=a, adjust=False).mean().to_numpy()
            else:
                # linearity of the adjust=False recurrence: the seeded-zero
                # run plus the carried state decayed per-row
                base = (
                    _pd.Series(np.concatenate([[0.0], v]))
                    .ewm(alpha=a, adjust=False)
                    .mean()
                    .to_numpy()[1:]
                )
                decay = (1.0 - a) ** np.arange(1, len(v) + 1, dtype=np.float64)
                ew = base + decay * y_in
            body = body.append_column(
                names[0], pa.array(ew, pa.float64(), from_pandas=True)
            )
    return body


def _bucket_slices(t: pa.Table):
    """(bucket_id, slice) pairs of a table sorted by BUCKET_COL."""
    b = t.column(BUCKET_COL).to_numpy(zero_copy_only=False)
    ub, starts = np.unique(b, return_index=True)
    bounds = np.r_[starts, len(b)]
    for i, bid in enumerate(ub):
        yield int(bid), t.slice(bounds[i], bounds[i + 1] - bounds[i])


def _phase_a(B: int, phase_sort: list[str], cold_fn, summarize_fn, shards) -> tuple:
    """One physical partition: concat + ONE sort by (bucket, *phase_sort),
    then the cold pass over the cold slice and a summary per hot slice.
    Returns (cold_result, hot_sorted, {bucket: summary})."""
    parts = [s for s in shards if s.num_rows]
    t = parts[0] if len(parts) == 1 else pa.concat_tables(
        parts or [shards[0]], promote_options="default"
    )
    t = t.sort_by(
        [(BUCKET_COL, "ascending")] + [(k, "ascending") for k in phase_sort]
    )
    bcol = t.column(BUCKET_COL).to_numpy(zero_copy_only=False)
    n_cold = int(np.searchsorted(bcol, B))
    cold = t.slice(0, n_cold).drop_columns([BUCKET_COL])
    hot = t.slice(n_cold)
    cold_out = cold_fn(cold)
    sums = {
        bid: summarize_fn(seg.drop_columns([BUCKET_COL]))
        for bid, seg in _bucket_slices(hot)
    }
    return cold_out, hot, sums


def _phase_b(hot_t: pa.Table, carries: dict, cold_fn, hot_fn) -> pa.Table:
    """One physical partition's hot slices -> results with carry-in state."""
    outs = [
        hot_fn(seg.drop_columns([BUCKET_COL]), carries[bid])
        for bid, seg in _bucket_slices(hot_t)
    ]
    if not outs:  # schema must match the cold output exactly
        return cold_fn(hot_t.drop_columns([BUCKET_COL]))
    return pa.concat_tables(outs, promote_options="default")


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def _run_hot_split(
    ds,
    key: str,
    ts_col: str,
    *,
    cold_fn,
    summarize_fn,
    fold_fn,
    hot_fn,
    empty_summary: dict,
    wt: int = 0,
    wl: int = 0,
    min_spacing: int = 1,
    halo_col: Optional[str] = None,
    phase_sort: Optional[list[str]] = None,
    hot_threshold: int,
    target_seg_rows: int,
    num_buckets: Optional[int] = None,
    schema: Optional[pa.Schema] = None,
    analyze_ds=None,
):
    """Generic hot-entity-split runner (see module docstring for the plan):
    callbacks define the per-slice compute —

    - ``cold_fn(table) -> table``: the plain kernel over a multi-entity
      slice sorted by (*phase_sort); also defines the output schema.
    - ``summarize_fn(segment) -> dict``: tiny summary of one hot segment.
    - ``fold_fn(list[summary]) -> list[carry]``: per-entity fold of the
      segment summaries (in time order) into per-segment carry-in state.
    - ``hot_fn(segment, carry) -> table``: one hot segment with its carry.

    ``wt``/``wl``: trailing/leading halo widths in ts units (0 = no halos);
    ``min_spacing``: minimum ts distance between cut points."""
    import ray
    import ray.data as rd

    from nvtabular_ray.pipelines.partitioned import _default_num_buckets

    B = num_buckets or _default_num_buckets()
    if schema is None:
        from nvtabular_ray.arrow_utils import dataset_arrow_schema

        schema = dataset_arrow_schema(ds)

    ads = analyze_ds if analyze_ds is not None else ds
    hot_counts = _hot_entity_counts(ads, key, hot_threshold)
    if len(hot_counts) and hot_counts[key].isna().any():
        # the split machinery keys on value equality (index_in routing,
        # ts sampling) which cannot address a NULL entity; failing loudly
        # beats silently leaving a hot straggler unsplit
        n_null = int(hot_counts.loc[hot_counts[key].isna(), "n"].iloc[0])
        raise ValueError(
            f"hot_threshold: {n_null} rows have a NULL {key!r} — a null "
            "entity cannot be hot-split; filter or fill the null keys first"
        )
    keys_arr = (
        pa.array(hot_counts[key].tolist(), schema.field(key).type) if len(hot_counts) else None
    )

    cuts_list: list[np.ndarray] = []
    if len(hot_counts):
        sample = _sample_hot_ts(ads, key, ts_col, hot_counts, keys_arr)
        s_ts, _ = _ts_to_us_np(sample.column(ts_col))
        # ONE index_in + argsort groups the sample by entity; a per-entity
        # boolean scan of the whole sample would be quadratic in hot
        # entities (every sample row is hot by construction of the thin
        # filter, so eidx has no nulls)
        eidx = pc.index_in(sample.column(key).combine_chunks(), keys_arr).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(eidx, kind="stable")
        eidx_s, ts_s = eidx[order], s_ts[order]
        bounds = np.searchsorted(eidx_s, np.arange(len(hot_counts) + 1))
        for e, n in enumerate(hot_counts["n"].tolist()):
            cuts_list.append(
                _choose_cuts(ts_s[bounds[e]:bounds[e + 1]], int(n), target_seg_rows, min_spacing)
            )
    n_segs = np.array([len(c) + 1 for c in cuts_list], dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(n_segs)])[:-1] if len(n_segs) else np.empty(0, np.int64)
    total = B + int(n_segs.sum())
    P = B  # physical partitions; logical buckets ride p = bucket % P

    hot = {"keys": keys_arr, "base": base, "cuts": cuts_list, "wt": wt, "wl": wl,
           "halo_col": halo_col}
    psort = list(phase_sort or [])

    @ray.remote
    def split_block(block, hot_):
        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        out = _split_one(block, key, ts_col, B, total, P, hot_)
        # num_returns=1 delivers the return value AS-IS (no tuple unpack):
        # a single-partition plan must return the lone shard, not a 1-tuple
        return out if P > 1 else out[0]

    @ray.remote(num_returns=3)
    def phase_a(*shards):
        return _phase_a(B, psort, cold_fn, summarize_fn, shards)

    @ray.remote
    def phase_b(hot_t, carries):
        return _phase_b(hot_t, carries, cold_fn, hot_fn)

    hot_ref = ray.put(hot)
    splits = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, m in bundle.blocks:
            if m.num_rows is not None and m.num_rows == 0:
                continue
            r = split_block.options(num_returns=P).remote(ref, hot_ref)
            # ray returns a BARE ref (not a 1-list) when num_returns == 1,
            # which a single-partition plan (num_buckets=1) hits
            splits.append(r if isinstance(r, list) else [r])
    if not splits:
        # empty input: run the cold kernel on a zero-row table so the
        # result carries the OUTPUT schema (feature/join columns), not the
        # raw input schema the bare dataset would report
        empty = schema.empty_table().append_column(
            HALO_COL, pa.array([], pa.int8())
        )
        return rd.from_arrow(cold_fn(empty))

    a_out = [phase_a.remote(*[s[p] for s in splits]) for p in range(P)]
    cold_refs = [o[0] for o in a_out]
    if total == B:
        return rd.from_arrow_refs(cold_refs)

    # driver fold: O(hot entities x segments) summaries, independent of rows
    all_sums: dict[int, dict] = {}
    for d in ray.get([o[2] for o in a_out]):
        all_sums.update(d)  # logical buckets are disjoint across partitions
    carries_by_bucket: dict[int, dict] = {}
    for e in range(len(n_segs)):
        segs = [all_sums.get(B + int(base[e]) + j, empty_summary) for j in range(int(n_segs[e]))]
        for j, carry in enumerate(fold_fn(segs)):
            carries_by_bucket[B + int(base[e]) + j] = carry
    hot_refs = [
        phase_b.remote(
            a_out[p][1], {b: c for b, c in carries_by_bucket.items() if b % P == p}
        )
        for p in range(P)
    ]
    return rd.from_arrow_refs(cold_refs + hot_refs)


def ordered_features(
    ds,
    key: str,
    ts_col: str,
    specs: list[dict],
    hot_threshold: int = 1_000_000,
    target_seg_rows: int = 250_000,
    num_buckets: Optional[int] = None,
    sort_cols: Optional[list[str]] = None,
    analyze_ds=None,
):
    """Input rows + ordered feature columns, with entities above
    ``hot_threshold`` rows split into time segments of ~``target_seg_rows``
    (exactness preserved via halos + carries, see module docstring).

    specs (dicts):
      {"kind": "lag", "col", "shift": ±k}                     -> {col}_difference_lag_{k} (float32)
      {"kind": "sessionize", "gap": sec, "out": "session_id",
       "emit": ["turn_in_session", "sec_since_session_start"]} -> int64
        (+ int64 turn index / float64 elapsed seconds; the open-session
        carry is (rows so far, session start ts))
      {"kind": "rolling", "col", "window": sec, "aggs": [...],
       "direction": "trailing"|"leading"}                     -> {col}_w{W}s_{agg}
      {"kind": "expanding", "col", "aggs": [...]}             -> {col}_cum_{agg}
      {"kind": "backfill", "col",
       "direction": "forward"|"backward", "out": ...}         -> {col}_filled (col's dtype)
      {"kind": "rank", "method": "row_number"|"percent_rank"|"ntile",
       "n": tiles, "out": ...}                                -> int64 position /
        float64 pct / int64 tile (carries = prior segments' body row counts
        + the entity total, known at fold time; dense_rank is unsplit-only —
        a tie group could straddle a cut. Under ts ties pass ``sort_cols``
        tie-breakers or the position is partition-dependent, exactly as in
        the unsplit GroupRank)
      {"kind": "shift", "col", "shift": ±k}                   -> {col}_shift_{k}
        (col's dtype — raw lag/lead value; carries = k raw boundary values
        per direction, dtype-preserving like context tails)
      {"kind": "last_where", "col", "cond": bool_col,
       "include_current": False}                              -> {col}_last_where
        (col's dtype; forward carry = the last matched row's value)
      {"kind": "ewma", "col", "alpha": a}                     -> {col}_ewma
        (float64; adjust=False only — the recurrence is linear in the
        carried state, so a segment folds as y_out = (1-a)^n y_in + B;
        requires a non-null value column on the hot path)

    ``sort_cols``: extra tie-breakers after ts (needed only when ts has
    duplicates within an entity AND a lag/lead spec is used).

    ``analyze_ds``: optional cheaper stand-in for the two ANALYZE passes
    (entity counts + hot-ts sampling), which only read ``key``/``ts_col``.
    When ``ds`` is a lazy transform chain, each extra scan re-executes the
    chain — pass the raw upstream source (row-identical on key+ts, e.g.
    the pre-transform parquet read) so analysis costs a pruned read
    instead of two re-executions of the whole pipeline."""
    _validate_specs(specs)

    from nvtabular_ray.arrow_utils import dataset_arrow_schema

    schema = dataset_arrow_schema(ds)
    is_ts = pa.types.is_timestamp(schema.field(ts_col).type)
    wt, wl = _max_windows_us(specs, is_ts)
    cfg = {"key": key, "ts_col": ts_col, "specs": specs, "is_ts": is_ts}
    sort_keys = [ts_col] + [c for c in (sort_cols or []) if c != ts_col]

    return _run_hot_split(
        ds, key, ts_col,
        cold_fn=lambda t: _compute_cold(t, cfg),
        summarize_fn=lambda seg: _summarize_segment(seg, cfg),
        fold_fn=lambda segs: _fold_carries(segs, cfg),
        hot_fn=lambda t, carry: _compute_hot(t, cfg, carry),
        empty_summary=_EMPTY_SUMMARY,
        wt=wt, wl=wl, min_spacing=max(wt, wl, 1) + 1,
        phase_sort=[key] + sort_keys,
        hot_threshold=hot_threshold, target_seg_rows=target_seg_rows,
        num_buckets=num_buckets, analyze_ds=analyze_ds,
    )
