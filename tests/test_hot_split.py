"""hot_split.ordered_features: split output must EXACTLY match the plain
(one-entity-one-bucket) kernels on skewed data.

The reference semantics are the repo's own ordered-feature kernels
(`_compute_cold` = the same grouped_np kernels the flagship uses); the test
pins that halo replication + carry folding reproduce them bit-for-bit-ish
(allclose, equal_nan) when a hot entity is torn into time segments.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
from hypothesis import given, settings, strategies as st

from nvtabular_ray.pipelines.hot_split import (
    HALO_COL,
    _choose_cuts,
    _compute_cold,
    ordered_features,
)

SPECS = [
    {"kind": "lag", "col": "val", "shift": 1},
    {"kind": "lag", "col": "val", "shift": -2},
    {"kind": "sessionize", "gap": 300, "out": "session_id",
     "emit": ["turn_in_session", "sec_since_session_start"]},
    {"kind": "rolling", "col": "val", "window": 600,
     "aggs": ["count", "mean", "min", "std"]},
    {"kind": "rolling", "col": "val", "window": 450,
     "aggs": ["sum", "max"], "direction": "leading"},
    {"kind": "expanding", "col": "val",
     "aggs": ["count", "sum", "mean", "min", "max", "var"]},
    {"kind": "backfill", "col": "val"},
    {"kind": "backfill", "col": "val", "direction": "backward", "out": "val_bfilled"},
    # r4 session 3: turn position through segment splits (carry = row counts)
    {"kind": "rank", "out": "turn_pos"},
    {"kind": "rank", "method": "percent_rank", "out": "turn_pct"},
    {"kind": "rank", "method": "ntile", "n": 4, "out": "turn_q"},
    # r4 session 3: previous-k context through splits (carry = rendered tail)
    {"kind": "context", "col": "text", "k": 3, "sep": "|"},
    # r5: raw shift (dtype-preserving) / conditional last / ewma carries
    {"kind": "shift", "col": "text", "shift": 2},
    {"kind": "shift", "col": "val", "shift": -3, "out": "val_lead3"},
    {"kind": "last_where", "col": "val2", "cond": "is_evt"},
    {"kind": "ewma", "col": "val2", "alpha": 0.3},
    {"kind": "rolling", "col": "val2", "window": 500, "aggs": ["first", "last"]},
]


def _make_table(n_hot=4000, n_cold=12, rows_cold=120, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)

    def entity(name, n):
        gaps = rng.integers(1, 400, size=n)  # irregular, strictly increasing
        ts = np.cumsum(gaps) + int(rng.integers(0, 10**6))
        val = rng.normal(size=n)
        val[rng.random(n) < 0.07] = np.nan
        return pd.DataFrame(
            {
                "conv_id": name,
                "ts": pd.to_datetime(ts, unit="s"),
                "val": val,
                "val2": rng.normal(size=n) * 5,  # non-null (ewma hot path)
                "is_evt": rng.random(n) < 0.2,
                "text": [f"{name}-{i}" for i in range(n)],
            }
        )

    frames = [entity("hot_conv", n_hot)]
    frames += [entity(f"c{i:02d}", rows_cold) for i in range(n_cold)]
    df = pd.concat(frames, ignore_index=True)
    df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _expected(tbl: pa.Table) -> pd.DataFrame:
    srt = tbl.sort_by([("conv_id", "ascending"), ("ts", "ascending")])
    srt = srt.append_column(HALO_COL, pa.array(np.zeros(srt.num_rows, np.int8)))
    cfg = {"key": "conv_id", "ts_col": "ts", "specs": SPECS, "is_ts": True}
    return _compute_cold(srt, cfg).to_pandas()


def _got(tbl: pa.Table, **kw) -> pd.DataFrame:
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = ordered_features(ds, "conv_id", "ts", SPECS, **kw)
    return (
        pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        )
        .sort_by([("conv_id", "ascending"), ("ts", "ascending")])
        .to_pandas()
    )


def _assert_frames_match(exp: pd.DataFrame, got: pd.DataFrame):
    assert len(exp) == len(got)
    assert set(exp.columns) == set(got.columns)
    assert (exp["text"].to_numpy() == got["text"].to_numpy()).all()
    assert (exp["conv_id"].to_numpy() == got["conv_id"].to_numpy()).all()
    for c in exp.columns:
        if c in ("conv_id", "ts", "text"):
            continue
        if exp[c].dtype == object:  # string features (context concat)
            assert exp[c].fillna("\0").tolist() == got[c].fillna("\0").tolist(), (
                f"column {c}"
            )
            continue
        e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        g = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(e, g, rtol=1e-6, atol=1e-8, equal_nan=True,
                                   err_msg=f"column {c}")


def test_hot_entity_split_matches_unsplit(ray_session):
    tbl = _make_table()
    exp = _expected(tbl)
    # hot_conv (4000 rows) splits into ~7 time segments of ~600 rows
    got = _got(tbl, hot_threshold=1000, target_seg_rows=600, num_buckets=4)
    assert exp["session_id"].max() > 3  # sessions actually break
    _assert_frames_match(exp, got)


def test_no_hot_entities_pure_cold_path(ray_session):
    tbl = _make_table(n_hot=800)
    exp = _expected(tbl)
    got = _got(tbl, hot_threshold=10_000, num_buckets=4)
    _assert_frames_match(exp, got)


def test_backfill_carry_across_segments(ray_session):
    # valid values are 500 rows apart while segments are ~300 rows: most
    # segments contain NO valid value, so the fill must ride the folded
    # carry through empty-carry segments in both directions
    n = 3000
    ts = np.arange(n, dtype=np.int64) * 60
    val = np.full(n, np.nan)
    val[::500] = np.arange(len(val[::500]), dtype=np.float64) + 1.0
    df = pd.DataFrame(
        {"conv_id": "bf_conv", "ts": pd.to_datetime(ts, unit="s"), "val": val}
    )
    specs = [
        {"kind": "backfill", "col": "val"},
        {"kind": "backfill", "col": "val", "direction": "backward", "out": "val_b"},
    ]
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    srt = tbl.append_column(HALO_COL, pa.array(np.zeros(n, np.int8)))
    cfg = {"key": "conv_id", "ts_col": "ts", "specs": specs, "is_ts": True}
    exp = _compute_cold(srt, cfg).to_pandas()

    ds = ray.data.from_arrow(tbl).repartition(5)
    out = ordered_features(
        ds, "conv_id", "ts", specs, hot_threshold=500, target_seg_rows=300, num_buckets=2
    )
    got = (
        pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        )
        .sort_by([("ts", "ascending")])
        .to_pandas()
    )
    for c in ("val_filled", "val_b"):
        e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        g = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(e, g, equal_nan=True, err_msg=c)
    # sanity: forward fill leaves only the leading run unfilled
    assert np.isnan(got["val_filled"].to_numpy(dtype=np.float64, na_value=np.nan)).sum() == 0
    assert np.isnan(got["val_b"].to_numpy(dtype=np.float64, na_value=np.nan)).sum() == 499


def test_temporal_api_hot_threshold_parity(ray_session):
    """sessionize / windowed_agg / expanding_agg / backfill with
    hot_threshold= must equal their default (one-bucket) plans."""
    from nvtabular_ray.pipelines.temporal import (
        backfill,
        expanding_agg,
        sessionize,
        windowed_agg,
    )

    tbl = _make_table(n_hot=2500, n_cold=6, rows_cold=80)
    ds = ray.data.from_arrow(tbl).repartition(6).materialize()
    kw = dict(hot_threshold=400, target_seg_rows=300, num_buckets=3)

    legs = [
        (sessionize(ds, "conv_id", "ts", 300),
         sessionize(ds, "conv_id", "ts", 300, **kw), ["session_id"]),
        (windowed_agg(ds, "conv_id", "ts", "val", 600, ["count", "mean"], prefix="r_"),
         windowed_agg(ds, "conv_id", "ts", "val", 600, ["count", "mean"], prefix="r_", **kw),
         ["r_count", "r_mean"]),
        (expanding_agg(ds, "conv_id", "ts", "val", ["count", "sum"]),
         expanding_agg(ds, "conv_id", "ts", "val", ["count", "sum"], **kw),
         ["val_cum_count", "val_cum_sum"]),
        (backfill(ds, "conv_id", "ts", ["val"]),
         backfill(ds, "conv_id", "ts", ["val"], **kw), ["val_filled"]),
    ]
    for base, hot, cols in legs:
        a = base.to_pandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
        b = hot.to_pandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
        assert len(a) == len(b)
        assert set(a.columns) == set(b.columns)
        for c in cols:
            x = a[c].to_numpy(dtype=np.float64, na_value=np.nan)
            y = b[c].to_numpy(dtype=np.float64, na_value=np.nan)
            np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-9, equal_nan=True,
                                       err_msg=f"column {c}")


@st.composite
def _ordered_frames(draw):
    """Adversarial tiny frames: few entities, ts ties, nulls, skewed sizes."""
    n_entities = draw(st.integers(1, 4))
    frames = []
    rid = 0
    for e in range(n_entities):
        n = draw(st.integers(1, 120))
        # ts with heavy tie probability and irregular gaps
        gaps = draw(st.lists(st.integers(0, 400), min_size=n, max_size=n))
        ts = np.cumsum(np.asarray(gaps, dtype=np.int64))
        nulls = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        val = np.arange(n, dtype=np.float64) * 0.5 - 3.0
        val[np.asarray(nulls)] = np.nan
        conds = draw(st.lists(st.booleans(), min_size=n, max_size=n))
        frames.append(pd.DataFrame({
            "k": f"e{e}",
            "ts": pd.to_datetime(ts, unit="s"),
            "rid": np.arange(rid, rid + n, dtype=np.int64),
            "val": val,
            "cnd": np.asarray(conds),
        }))
        rid += n
    df = pd.concat(frames, ignore_index=True)
    return df.sample(frac=1.0, random_state=0).reset_index(drop=True)


@settings(max_examples=10, deadline=None)
@given(_ordered_frames(), st.integers(2, 50))
def test_property_split_equals_unsplit(df, seg_rows):
    specs = [
        {"kind": "lag", "col": "val", "shift": 1},
        {"kind": "sessionize", "gap": 120, "out": "sid",
         "emit": ["turn_in_session", "sec_since_session_start"]},
        {"kind": "rolling", "col": "val", "window": 300,
         "aggs": ["count", "sum", "max", "first", "last"]},
        {"kind": "expanding", "col": "val", "aggs": ["count", "mean"]},
        {"kind": "backfill", "col": "val"},
        {"kind": "shift", "col": "val", "shift": 2},
        {"kind": "last_where", "col": "val", "cond": "cnd"},
    ]
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    srt = tbl.sort_by([("k", "ascending"), ("ts", "ascending"), ("rid", "ascending")])
    srt = srt.append_column(HALO_COL, pa.array(np.zeros(srt.num_rows, np.int8)))
    cfg = {"key": "k", "ts_col": "ts", "specs": specs, "is_ts": True}
    exp = _compute_cold(srt, cfg).to_pandas()

    ds = ray.data.from_arrow(tbl).repartition(4)
    out = ordered_features(
        ds, "k", "ts", specs, hot_threshold=10, target_seg_rows=seg_rows,
        num_buckets=3, sort_cols=["rid"],
    )
    got = (
        pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        )
        .sort_by([("k", "ascending"), ("ts", "ascending"), ("rid", "ascending")])
        .to_pandas()
    )
    assert len(exp) == len(got)
    for c in exp.columns:
        if c in ("k", "ts"):
            continue
        e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        g = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(e, g, rtol=1e-9, atol=1e-9, equal_nan=True,
                                   err_msg=f"column {c}")


def test_asof_join_hot_threshold_parity(ray_session):
    """asof_join with hot_threshold= (boundary-row carries) must equal the
    default one-bucket plan for every direction, with strict + tolerance."""
    from nvtabular_ray.pipelines.temporal import asof_join

    rng = np.random.default_rng(23)

    def sides(key, n_left, n_right):
        lts = np.sort(rng.choice(np.arange(1, n_left * 40), size=n_left, replace=False))
        rts = np.sort(rng.choice(np.arange(1, n_left * 40), size=n_right, replace=False))
        left = pd.DataFrame({
            "k": key, "ts": pd.to_datetime(lts, unit="s"),
            "lid": np.arange(n_left, dtype=np.int64),
        })
        rv = rng.normal(size=n_right)
        rv[rng.random(n_right) < 0.1] = np.nan
        right = pd.DataFrame({
            "k": key, "ts": pd.to_datetime(rts, unit="s"), "feat": rv,
        })
        return left, right

    lf, rf = [], []
    l, r = sides("H", 4000, 900)  # hot key: 4900 combined rows
    lf.append(l); rf.append(r)
    for i in range(5):
        l, r = sides(f"c{i}", 60, 25)
        lf.append(l); rf.append(r)
    left = pa.Table.from_pandas(pd.concat(lf, ignore_index=True), preserve_index=False)
    right = pa.Table.from_pandas(pd.concat(rf, ignore_index=True), preserve_index=False)

    for kw in (
        {"direction": "backward"},
        {"direction": "backward", "strict": True},
        {"direction": "forward", "tolerance": pd.Timedelta("300s")},
        {"direction": "nearest"},
    ):
        lds = ray.data.from_arrow(left).repartition(5)
        rds = ray.data.from_arrow(right).repartition(3)
        base = asof_join(lds, rds, "k", "ts", right_cols=["feat"], num_buckets=3, **kw)
        hot = asof_join(lds, rds, "k", "ts", right_cols=["feat"], num_buckets=3,
                        hot_threshold=800, target_seg_rows=500, **kw)
        a = base.to_pandas().sort_values(["k", "lid"]).reset_index(drop=True)
        b = hot.to_pandas().sort_values(["k", "lid"]).reset_index(drop=True)
        assert len(a) == len(b) == len(left)
        x = a["feat"].to_numpy(dtype=np.float64, na_value=np.nan)
        y = b["feat"].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(x, y, equal_nan=True, err_msg=str(kw))
        # the hot leg must actually have matched across segment boundaries
        assert np.isfinite(y).sum() > 0


def test_range_join_hot_threshold_parity(ray_session):
    """range_join with hot_threshold= (side-aware right-row halos) must emit
    exactly the default plan's pair multiset — each pair exactly once."""
    from nvtabular_ray.pipelines.temporal import range_join

    rng = np.random.default_rng(31)

    def sides(key, n_left, n_right):
        lts = np.sort(rng.choice(np.arange(1, n_left * 20), size=n_left, replace=False))
        rts = np.sort(rng.choice(np.arange(1, n_left * 20), size=n_right, replace=False))
        left = pd.DataFrame({
            "k": key, "ts": pd.to_datetime(lts, unit="s"),
            "lid": np.arange(n_left, dtype=np.int64),
        })
        right = pd.DataFrame({
            "k": key, "ts": pd.to_datetime(rts, unit="s"),
            "rid": np.arange(n_right, dtype=np.int64),
        })
        return left, right

    lf, rf = [], []
    l, r = sides("H", 3000, 800)
    lf.append(l); rf.append(r)
    for i in range(4):
        l, r = sides(f"c{i}", 50, 20)
        lf.append(l); rf.append(r)
    left = pa.Table.from_pandas(pd.concat(lf, ignore_index=True), preserve_index=False)
    right = pa.Table.from_pandas(pd.concat(rf, ignore_index=True), preserve_index=False)

    for kw in (
        {"lower": pd.Timedelta("-600s"), "upper": pd.Timedelta("0s")},
        {"lower": pd.Timedelta("-300s"), "upper": pd.Timedelta("300s"), "how": "left"},
        {"lower": pd.Timedelta("60s"), "upper": pd.Timedelta("900s")},
    ):
        lds = ray.data.from_arrow(left).repartition(4)
        rds = ray.data.from_arrow(right).repartition(3)
        base = range_join(lds, rds, "k", "ts", right_cols=["rid"], num_buckets=3, **kw)
        hot = range_join(lds, rds, "k", "ts", right_cols=["rid"], num_buckets=3,
                         hot_threshold=700, target_seg_rows=400, **kw)
        a = base.to_pandas().sort_values(["k", "lid", "rid"]).reset_index(drop=True)
        b = hot.to_pandas().sort_values(["k", "lid", "rid"]).reset_index(drop=True)
        assert len(a) == len(b) > 0, kw
        for c in ("lid", "rid"):
            x = a[c].to_numpy(dtype=np.float64, na_value=np.nan)
            y = b[c].to_numpy(dtype=np.float64, na_value=np.nan)
            np.testing.assert_allclose(x, y, equal_nan=True, err_msg=f"{kw} {c}")


def test_choose_cuts_spacing():
    ts = np.arange(0, 100_000, 10, dtype=np.int64)  # 10k samples
    cuts = _choose_cuts(ts, n_rows=10_000, target_seg_rows=1_000, min_spacing=25_000)
    assert len(cuts) >= 1
    assert (np.diff(np.r_[ts.min(), cuts]) >= 25_000).all()
    # unsplittable: min_spacing wider than the whole range
    assert len(_choose_cuts(ts, 10_000, 1_000, 10**9)) == 0


def test_duplicate_ts_windows(ray_session):
    # equal-ts rows are window peers (rolling) / excluded peers (expanding);
    # lag/lead omitted: positional order under ties is sort-dependent.
    rng = np.random.default_rng(11)
    n = 3000
    ts = np.sort(rng.integers(0, n // 4, size=n)) * 60  # heavy duplicates
    df = pd.DataFrame(
        {
            "conv_id": "dup_conv",
            "ts": pd.to_datetime(ts, unit="s"),
            "val": rng.normal(size=n),
        }
    )
    specs = [
        {"kind": "sessionize", "gap": 300, "out": "session_id"},
        {"kind": "rolling", "col": "val", "window": 600, "aggs": ["count", "sum"]},
        {"kind": "expanding", "col": "val", "aggs": ["count", "mean"]},
    ]
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    srt = tbl.append_column(HALO_COL, pa.array(np.zeros(n, np.int8)))
    cfg = {"key": "conv_id", "ts_col": "ts", "specs": specs, "is_ts": True}
    exp = _compute_cold(srt, cfg).to_pandas()

    ds = ray.data.from_arrow(tbl).repartition(6)
    out = ordered_features(
        ds, "conv_id", "ts", specs, hot_threshold=500, target_seg_rows=400, num_buckets=2
    )
    got = (
        pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        )
        .sort_by([("ts", "ascending")])
        .to_pandas()
    )
    assert len(got) == n
    for c in ("session_id", "val_w600s_count", "val_w600s_sum",
              "val_cum_count", "val_cum_mean"):
        e = exp[c].to_numpy(dtype=np.float64, na_value=np.nan)
        g = got[c].to_numpy(dtype=np.float64, na_value=np.nan)
        np.testing.assert_allclose(np.sort(e), np.sort(g), rtol=1e-9, atol=1e-9,
                                   equal_nan=True, err_msg=f"column {c}")
    # per-ts multiset equality (rows at one instant are interchangeable)
    key = got["ts"].astype(np.int64).to_numpy()
    ekey = exp["ts"].astype(np.int64).to_numpy()
    assert (key == ekey).all()


def test_context_group_rank_pipeline_hot_threshold_parity(ray_session):
    """The functional context_concat / group_rank APIs: hot_threshold path
    (forced splitting) must equal the plain bucketed path exactly."""
    from nvtabular_ray.pipelines.temporal import context_concat, group_rank

    tbl = _make_table(n_hot=900, n_cold=4, rows_cold=40)
    ds = ray.data.from_arrow(tbl).repartition(6)

    def collect(out):
        return (
            pa.concat_tables(
                out.iter_batches(batch_size=None, batch_format="pyarrow"),
                promote_options="default",
            )
            .sort_by([("conv_id", "ascending"), ("ts", "ascending")])
            .to_pandas()
        )

    plain = collect(context_concat(ds, "conv_id", "ts", "text", k=2, sep="|"))
    split = collect(
        context_concat(
            ds, "conv_id", "ts", "text", k=2, sep="|",
            hot_threshold=100, target_seg_rows=60,
        )
    )
    assert plain["text_ctx2"].fillna("\0").tolist() == split["text_ctx2"].fillna("\0").tolist()

    plain_r = collect(group_rank(ds, "conv_id", "ts"))
    split_r = collect(group_rank(ds, "conv_id", "ts", hot_threshold=100, target_seg_rows=60))
    assert plain_r["row_number"].tolist() == split_r["row_number"].tolist()


def test_ewma_halflife_hot_split_parity(ray_session):
    """Time-decay ewma carry ((num, den, t_ref) decayed once per segment)
    reproduces the unsplit kernel through ~7-segment splits, NaNs included."""
    rng = np.random.default_rng(7)
    hot = pd.DataFrame(
        {
            "k": "hot",
            "ts": pd.to_datetime(np.cumsum(rng.integers(1, 400, 4000)), unit="s"),
            "val": np.where(rng.random(4000) < 0.06, np.nan, rng.normal(size=4000)),
        }
    )
    colds = [
        pd.DataFrame(
            {
                "k": f"c{i}",
                "ts": pd.to_datetime(np.cumsum(rng.integers(1, 400, 80)), unit="s"),
                "val": rng.normal(size=80),
            }
        )
        for i in range(10)
    ]
    df = pd.concat([hot] + colds, ignore_index=True)
    df = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    specs = [{"kind": "ewma", "col": "val", "halflife": 600.0}]
    srt = tbl.sort_by([("k", "ascending"), ("ts", "ascending")]).append_column(
        HALO_COL, pa.array(np.zeros(len(df), np.int8))
    )
    cfg = {"key": "k", "ts_col": "ts", "specs": specs, "is_ts": True}
    exp = _compute_cold(srt, cfg).to_pandas()
    ds = ray.data.from_arrow(tbl).repartition(6)
    out = ordered_features(
        ds, "k", "ts", specs, hot_threshold=500, target_seg_rows=600, num_buckets=4
    )
    got = (
        pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow"),
            promote_options="default",
        )
        .sort_by([("k", "ascending"), ("ts", "ascending")])
        .to_pandas()
    )
    a = exp["val_ewma"].to_numpy()
    b = got["val_ewma"].to_numpy()
    assert (np.isnan(a) == np.isnan(b)).all()
    m = ~np.isnan(a)
    np.testing.assert_allclose(a[m], b[m], rtol=1e-9)
