"""Temporal engine tests: sessionize, as-of join, rolling windows, backfill,
transcript generator invariants, flagship pipeline e2e, zero-leakage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.pipelines.temporal import (
    asof_join,
    backfill,
    range_join,
    sessionize,
    windowed_agg,
)
from nvtabular_ray.pipelines.transcripts import transcript_features
from nvtabular_ray.transcripts import generate_transcripts, generate_transcripts_pandas


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


@pytest.fixture(scope="module")
def tdf():
    return generate_transcripts_pandas(40, seed=42, max_turns=200)


def test_generator_deterministic_and_monotone(tdf):
    tdf2 = generate_transcripts_pandas(40, seed=42, max_turns=200)
    pd.testing.assert_frame_equal(tdf, tdf2)
    g = tdf.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.diff().dropna() > pd.Timedelta(0)).all()
    # distributed generation matches driver-side generation
    dist = (
        generate_transcripts(40, seed=42, max_turns=200)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    local = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, local)


def test_sessionize_oracle(tdf):
    out = (
        sessionize(_ds(tdf), "conv_id", "ts", gap=300, num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    delta = o.groupby("conv_id")["ts"].diff()
    new_s = (delta > pd.Timedelta(seconds=300)) | delta.isna()
    oracle = new_s.groupby(o["conv_id"]).cumsum().astype("int64") - 1
    np.testing.assert_array_equal(out["session_id"], oracle)


def test_asof_join_oracle(tdf):
    # right side: per-conv "feature snapshots" at every 5th turn
    right = tdf[tdf["turn_idx"] % 5 == 0][["conv_id", "ts", "text_len"]].rename(
        columns={"text_len": "feat"}
    )
    left = tdf[["conv_id", "turn_idx", "ts"]]
    out = (
        asof_join(_ds(left), _ds(right), key="conv_id", left_ts="ts", num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    oracle = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="conv_id",
        direction="backward",
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        out["feat"].to_numpy(dtype="float64", na_value=np.nan),
        oracle["feat"].to_numpy(dtype="float64", na_value=np.nan),
    )
    assert len(out) == len(left)


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_pandas(tdf, direction):
    right = tdf[tdf["turn_idx"] % 5 == 0][["conv_id", "ts", "text_len"]].rename(
        columns={"text_len": "feat"}
    )
    left = tdf[["conv_id", "turn_idx", "ts"]]
    out = (
        asof_join(
            _ds(left), _ds(right), key="conv_id", left_ts="ts",
            direction=direction, num_buckets=8,
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    oracle = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="conv_id",
        direction=direction,
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        out["feat"].to_numpy(dtype="float64", na_value=np.nan),
        oracle["feat"].to_numpy(dtype="float64", na_value=np.nan),
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_tolerance_matches_pandas(tdf, direction):
    right = tdf[tdf["turn_idx"] % 7 == 0][["conv_id", "ts", "text_len"]].rename(
        columns={"text_len": "feat"}
    )
    left = tdf[["conv_id", "turn_idx", "ts"]]
    tol = pd.Timedelta(seconds=90)
    out = (
        asof_join(
            _ds(left), _ds(right), key="conv_id", left_ts="ts",
            direction=direction, tolerance=tol, num_buckets=8,
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    oracle = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="conv_id",
        direction=direction,
        tolerance=tol,
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        out["feat"].to_numpy(dtype="float64", na_value=np.nan),
        oracle["feat"].to_numpy(dtype="float64", na_value=np.nan),
    )


def test_asof_join_numeric_ts_tolerance():
    left = pd.DataFrame(
        {"k": ["a"] * 4 + ["b"] * 2, "t": [1.0, 5.0, 9.0, 20.0, 2.0, 8.0], "i": range(6)}
    )
    right = pd.DataFrame({"k": ["a", "a", "b"], "t": [4.0, 10.0, 7.0], "v": [1, 2, 3]})
    out = (
        asof_join(_ds(left, 2), _ds(right, 2), key="k", left_ts="t",
                  direction="nearest", tolerance=2.0, num_buckets=4)
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    oracle = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k",
        direction="nearest", tolerance=2.0,
    ).sort_values("i").reset_index(drop=True)
    np.testing.assert_array_equal(
        out["v"].to_numpy(dtype="float64", na_value=np.nan),
        oracle["v"].to_numpy(dtype="float64", na_value=np.nan),
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_range_join_matches_pandas(tdf, how):
    right = tdf[tdf["turn_idx"] % 4 == 0][["conv_id", "ts", "text_len"]].rename(
        columns={"text_len": "feat"}
    )
    left = tdf[["conv_id", "turn_idx", "ts"]]
    lower, upper = pd.Timedelta(seconds=-120), pd.Timedelta(seconds=120)
    out = (
        range_join(_ds(left), _ds(right), key="conv_id", left_ts="ts",
                   lower=lower, upper=upper, how=how, num_buckets=8)
        .to_pandas()
    )
    # oracle: explicit cartesian merge + interval filter, compared as
    # per-left-row (count, sum) of matched values
    m = left.merge(right.rename(columns={"ts": "rts"}), on="conv_id")
    m = m[(m["rts"] >= m["ts"] + lower) & (m["rts"] <= m["ts"] + upper)]
    exp = m.groupby(["conv_id", "turn_idx"])["feat"].agg(["count", "sum"])
    if how == "left":
        base = left.set_index(["conv_id", "turn_idx"])
        exp = exp.reindex(base.index, fill_value=0)
        # unmatched left rows appear exactly once (null feat)
        assert len(out) == int(exp["count"].clip(lower=1).sum())
    else:
        assert len(out) == int(exp["count"].sum())
    got = out.groupby(["conv_id", "turn_idx"])["feat"].agg(["count", "sum"])
    got = got.reindex(exp.index, fill_value=0)
    np.testing.assert_array_equal(got["count"].to_numpy(), exp["count"].to_numpy())
    np.testing.assert_allclose(
        got["sum"].to_numpy(dtype="float64"), exp["sum"].to_numpy(dtype="float64")
    )


def test_range_join_numeric_and_partition_invariance():
    rng = np.random.default_rng(3)
    left = pd.DataFrame({
        "conv_id": rng.integers(0, 9, 300).astype(str),
        "ts": rng.uniform(0, 100, 300),
        "i": np.arange(300),
    })
    right = pd.DataFrame({
        "conv_id": rng.integers(0, 9, 120).astype(str),
        "ts": rng.uniform(0, 100, 120),
        "v": rng.integers(0, 1000, 120),
    })
    outs = []
    for blocks, buckets in [(2, 4), (7, 16)]:
        out = (
            range_join(_ds(left, blocks), _ds(right, blocks), key="conv_id",
                       left_ts="ts", lower=-5.0, upper=5.0, num_buckets=buckets)
            .to_pandas().sort_values(["i", "v"]).reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    m = left.merge(right.rename(columns={"ts": "rts"}), on="conv_id")
    m = m[(m["rts"] >= m["ts"] - 5.0) & (m["rts"] <= m["ts"] + 5.0)]
    exp = m.sort_values(["i", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(outs[0]["i"], exp["i"])
    np.testing.assert_array_equal(outs[0]["v"], exp["v"])


def test_range_join_rejects_bad_how(tdf):
    with pytest.raises(ValueError, match="how"):
        range_join(_ds(tdf), _ds(tdf), key="conv_id", left_ts="ts",
                   lower=0, upper=1, how="outer")


def test_windowed_agg_leading_matches_bruteforce(tdf):
    ds = _ds(tdf[["conv_id", "turn_idx", "ts", "text_len"]])
    out = (
        windowed_agg(ds, "conv_id", "ts", "text_len", 600,
                     ["count", "sum"], direction="leading", num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    W = pd.Timedelta(seconds=600)
    exp_count = np.empty(len(o), np.int64)
    exp_sum = np.empty(len(o), np.float64)
    for i, r in o.iterrows():
        seg = o[(o["conv_id"] == r["conv_id"]) & (o["ts"] >= r["ts"]) & (o["ts"] <= r["ts"] + W)]
        exp_count[i] = seg["text_len"].notna().sum()
        exp_sum[i] = seg["text_len"].sum()
    np.testing.assert_array_equal(out["text_len_lead600s_count"], exp_count)
    np.testing.assert_allclose(out["text_len_lead600s_sum"], exp_sum)


def test_rolling_agg_rejects_bad_direction():
    from nvtabular_ray.ops.temporal_ops import RollingAgg

    with pytest.raises(ValueError, match="direction"):
        RollingAgg("conv_id", "ts", 600, direction="sideways")


def test_asof_join_rejects_bad_direction(tdf):
    with pytest.raises(ValueError, match="direction"):
        asof_join(_ds(tdf), _ds(tdf), key="conv_id", left_ts="ts", direction="sideways")


def test_asof_strict_excludes_current_instant(tdf):
    right = tdf[["conv_id", "ts", "text_len"]].rename(columns={"text_len": "feat"})
    left = tdf[["conv_id", "turn_idx", "ts"]]
    out = (
        asof_join(_ds(left), _ds(right), key="conv_id", left_ts="ts", strict=True, num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # first turn of each conv has no strictly-earlier snapshot
    firsts = out.groupby("conv_id").head(1)
    assert firsts["feat"].isna().all()
    # later turns see the PREVIOUS turn's value, never their own
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    prev = o.groupby("conv_id")["text_len"].shift(1)
    np.testing.assert_array_equal(
        out["feat"].to_numpy(dtype="float64", na_value=np.nan),
        prev.to_numpy(dtype="float64", na_value=np.nan),
    )


def test_windowed_agg_oracle(tdf):
    out = (
        windowed_agg(_ds(tdf), "conv_id", "ts", "text_len", 600, ["count", "mean"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    rolled = (
        o.groupby("conv_id", group_keys=False)
        .rolling(pd.Timedelta(seconds=600), on="ts", closed="both")["text_len"]
        .agg(["count", "mean"])
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["text_len_w600s_count"], rolled["count"].astype("int64"))
    np.testing.assert_allclose(out["text_len_w600s_mean"], rolled["mean"], rtol=1e-12)


def test_backfill_forward(tdf):
    df = tdf.copy()
    df["sparse"] = np.where(df["turn_idx"] % 3 == 0, df["text_len"].astype("float64"), np.nan)
    out = (
        backfill(_ds(df), "conv_id", "ts", ["sparse"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    oracle = o.groupby("conv_id")["sparse"].ffill()
    np.testing.assert_array_equal(
        out["sparse_filled"].to_numpy(dtype="float64", na_value=np.nan),
        oracle.to_numpy(dtype="float64", na_value=np.nan),
    )


def test_flagship_pipeline_e2e(tdf):
    feats, wf = transcript_features(_ds(tdf), num_buckets=8)
    out = feats.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # row count + per-turn text equality under stable (conv_id, turn_idx) order
    assert len(out) == len(o)
    assert (out["text"] == o["text"]).all()
    # feature sanity
    assert out["role"].isin([3, 4, 5]).all()  # 3 roles, vocab base 3
    assert (out["session_id"] >= 0).all()
    lag = out.groupby("conv_id")["text_len_difference_lag_1"]
    assert out.groupby("conv_id").head(1)["text_len_difference_lag_1"].isna().all()
    assert set(out.columns) >= {
        "role", "tool", "TE_role_text_len", "text_len_norm",
        "text_len_difference_lag_1", "text_len_difference_lag_-1",
        "session_id", "text_len_w600s_count", "text_len_w600s_mean",
    }


def test_zero_temporal_leakage(tdf):
    """Mutating rows with ts > t must not change leakage-free features at t
    (FIXTURES.md invariant 4)."""
    df = tdf.copy()
    cut = df.groupby("conv_id")["ts"].transform("median")
    mutated = df.copy()
    future = mutated["ts"] > cut
    mutated.loc[future, "text_len"] = 99_999

    out_a = windowed_agg(_ds(df), "conv_id", "ts", "text_len", 600, ["mean"], num_buckets=8).to_pandas()
    out_b = windowed_agg(_ds(mutated), "conv_id", "ts", "text_len", 600, ["mean"], num_buckets=8).to_pandas()

    key = ["conv_id", "turn_idx"]
    merged = out_a.merge(out_b, on=key, suffixes=("_a", "_b")).merge(
        df.assign(_cut=cut)[key + ["_cut"]], on=key
    )
    past_rows = merged[merged["ts_a"] <= merged["_cut"]]
    assert len(past_rows) > 0
    np.testing.assert_allclose(
        past_rows["text_len_w600s_mean_a"], past_rows["text_len_w600s_mean_b"], rtol=1e-12
    )


def test_transcript_features_projected_exchange_matches_default():
    # SURVEY §7.4.7: text bypassing the sorting exchange + rejoin on
    # (conv_id, turn_idx) must be value-identical to the passthrough path
    from nvtabular_ray.pipelines.transcripts import transcript_features
    from nvtabular_ray.transcripts import generate_transcripts

    ds = generate_transcripts(60, seed=5).repartition(4)
    a, _ = transcript_features(ds, num_buckets=8, project_exchange=False)
    b, _ = transcript_features(ds, num_buckets=8, project_exchange=True)
    pa_ = __import__("pandas")
    ka = a.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    kb = b.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert sorted(ka.columns) == sorted(kb.columns)
    for c in sorted(ka.columns):
        x, y = ka[c], kb[c]
        if x.dtype.kind == "f":
            import numpy as _np

            _np.testing.assert_allclose(
                x.to_numpy(dtype="float64", na_value=_np.nan),
                y.to_numpy(dtype="float64", na_value=_np.nan),
                rtol=1e-6, equal_nan=True,
            )
        else:
            assert x.equals(y), c
    # the per-turn text-equality invariant survives the rejoin
    assert (kb["text"] == ka["text"]).all()


def test_expanding_agg_matches_duckdb_exclude_group(tdf):
    """Expanding = all strictly-earlier same-entity rows (peers excluded):
    SQL RANGE UNBOUNDED PRECEDING .. CURRENT ROW EXCLUDE GROUP."""
    import duckdb

    from nvtabular_ray.pipelines.temporal import expanding_agg

    out = (
        expanding_agg(_ds(tdf), "conv_id", "ts", "text_len",
                      ["count", "sum", "mean", "min", "max"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = duckdb.sql(
        """
        SELECT conv_id, turn_idx,
               count(text_len) OVER w AS c, sum(text_len) OVER w AS s,
               avg(text_len) OVER w AS m, min(text_len) OVER w AS mn,
               max(text_len) OVER w AS mx
        FROM tdf
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     EXCLUDE GROUP)
        ORDER BY conv_id, turn_idx
        """
    ).df()
    np.testing.assert_array_equal(out["text_len_cum_count"], o["c"].astype("int64"))
    for col, ocol in [("sum", "s"), ("mean", "m"), ("min", "mn"), ("max", "mx")]:
        np.testing.assert_allclose(
            out[f"text_len_cum_{col}"], o[ocol].astype(float), rtol=1e-12, equal_nan=True
        )
    # first turn of every conversation sees nothing
    first = out.groupby("conv_id").head(1)
    assert (first["text_len_cum_count"] == 0).all()
    assert first["text_len_cum_mean"].isna().all()


def test_expanding_agg_ties_and_nans():
    """Equal-ts peers excluded; NaN values skipped, not poisoning."""
    from nvtabular_ray.functions.grouped_np import expanding_aggregate

    gid = np.array([0, 0, 0, 0, 1, 1])
    ts = np.array([1, 5, 5, 9, 2, 2], dtype=np.int64)
    v = np.array([10.0, np.nan, 30.0, 40.0, 7.0, 8.0])
    res = expanding_aggregate(v, ts, gid, ["count", "sum", "min", "max"])
    np.testing.assert_array_equal(res["count"], [0, 1, 1, 2, 0, 0])
    np.testing.assert_allclose(res["sum"], [np.nan, 10, 10, 40, np.nan, np.nan])
    np.testing.assert_allclose(res["min"], [np.nan, 10, 10, 10, np.nan, np.nan])
    np.testing.assert_allclose(res["max"], [np.nan, 10, 10, 30, np.nan, np.nan])


def test_rolling_min_max_rmq_matches_bruteforce():
    """Sparse-table RMQ rolling min/max == per-row brute force (with ties,
    NaNs, single-row groups, and windows spanning whole groups)."""
    from nvtabular_ray.functions.grouped_np import (
        grouped_window_bounds,
        rolling_aggregate,
    )

    rng = np.random.default_rng(7)
    n = 4000
    gid = np.sort(rng.integers(0, 150, n))
    ts = np.empty(n, np.int64)
    s = 0
    for g in np.unique(gid):
        c = int((gid == g).sum())
        ts[s : s + c] = np.sort(rng.integers(0, 40, c))
        s += c
    v = rng.normal(size=n)
    v[rng.random(n) < 0.2] = np.nan
    for w_us in (1, 7, 100):
        res = rolling_aggregate(v, ts, gid, w_us, ["min", "max"])
        lo, hi = grouped_window_bounds(ts, gid, w_us)
        for i in range(n):
            seg = v[lo[i] : hi[i]]
            ok = seg[~np.isnan(seg)]
            for a, fn in (("min", np.min), ("max", np.max)):
                exp = fn(ok) if len(ok) else np.nan
                got = res[a][i]
                assert (np.isnan(exp) and np.isnan(got)) or got == exp


def test_expanding_agg_workflow_op_fuses(tdf):
    """ExpandingAgg as a Workflow op shares the single bucketed shuffle."""
    from nvtabular_ray import Workflow, ops

    ds = _ds(tdf)
    node = ["text_len"] >> ops.ExpandingAgg("conv_id", "ts", aggs=["count", "mean"])
    wf = Workflow(node + ["conv_id", "turn_idx"])
    out = (
        wf.fit(ds).transform(ds).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "ts"]).reset_index(drop=True)
    grp = o.groupby("conv_id")["text_len"]
    expect_c = grp.transform(lambda x: x.expanding().count().shift(1).fillna(0))
    # ties: tdf timestamps are strictly increasing per conv (generator
    # invariant), so shift(1) == strictly-earlier here
    key = o.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        out["text_len_cum_count"], expect_c[key.index].astype("int64")
    )


def test_window_std_var_matches_duckdb(tdf):
    """std/var window aggs (prefix sums of mean-shifted squares, ddof=1)."""
    import duckdb

    from nvtabular_ray.functions.grouped_np import (
        expanding_aggregate,
        group_ids_sorted,
        rolling_aggregate,
    )

    o = tdf.sort_values(["conv_id", "ts"]).reset_index(drop=True)
    t = pa.Table.from_pandas(o, preserve_index=False)
    gid = group_ids_sorted(t, ["conv_id"])
    ts = o["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    v = o["text_len"].astype(float).to_numpy()
    r = rolling_aggregate(v, ts, gid, 600 * 10**6, ["std", "var"])
    e = expanding_aggregate(v, ts, gid, ["std"])
    q = duckdb.sql(
        """
        SELECT stddev_samp(text_len) OVER wr AS rsd,
               var_samp(text_len) OVER wr AS rvr,
               stddev_samp(text_len) OVER we AS esd
        FROM o
        WINDOW wr AS (PARTITION BY conv_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 600 SECOND PRECEDING AND CURRENT ROW),
               we AS (PARTITION BY conv_id ORDER BY ts
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)
        ORDER BY conv_id, ts
        """
    ).df()
    for got, col in [(r["std"], "rsd"), (r["var"], "rvr"), (e["std"], "esd")]:
        np.testing.assert_allclose(
            np.nan_to_num(got, nan=-1),
            np.nan_to_num(q[col].astype(float), nan=-1),
            rtol=1e-9,
            atol=1e-6,
        )


def test_windowed_distinct_matches_duckdb(tdf):
    """Trailing count(DISTINCT tool) per conversation — string column with
    ~50% nulls; nulls must not count (SQL semantics)."""
    import duckdb

    out = (
        windowed_agg(_ds(tdf), "conv_id", "ts", "tool", 600, ["distinct", "count"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", o)
    want = con.execute(
        """
        SELECT count(DISTINCT tool) OVER w AS d
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING AND CURRENT ROW)
        ORDER BY conv_id, turn_idx
        """
    ).fetchnumpy()["d"]
    np.testing.assert_array_equal(out["tool_w600s_distinct"], want.astype("int64"))
    # distinct <= non-null count, and 0 exactly where the window is all-null
    assert (out["tool_w600s_distinct"] <= out["tool_w600s_count"]).all()


def test_windowed_distinct_leading_and_numeric(tdf):
    """Leading window + numeric value column (dictionary-encodes ints too)."""
    import duckdb

    out = (
        windowed_agg(
            _ds(tdf), "conv_id", "ts", "text_len", 600, ["distinct"],
            num_buckets=8, direction="leading",
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", o)
    want = con.execute(
        """
        SELECT count(DISTINCT text_len) OVER w AS d
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts
                     RANGE BETWEEN CURRENT ROW AND INTERVAL 600 SECONDS FOLLOWING)
        ORDER BY conv_id, turn_idx
        """
    ).fetchnumpy()["d"]
    np.testing.assert_array_equal(out["text_len_lead600s_distinct"], want.astype("int64"))


def test_expanding_distinct_matches_duckdb(tdf):
    """Cumulative distinct tools per conversation, equal-ts peers excluded."""
    import duckdb
    from nvtabular_ray.pipelines.temporal import expanding_agg

    out = (
        expanding_agg(_ds(tdf), "conv_id", "ts", "tool", ["distinct"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    o = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", o)
    want = con.execute(
        """
        SELECT count(DISTINCT tool) OVER w AS d
        FROM t
        WINDOW w AS (PARTITION BY conv_id ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)
        ORDER BY conv_id, turn_idx
        """
    ).fetchnumpy()["d"]
    np.testing.assert_array_equal(out["tool_cum_distinct"], want.astype("int64"))


def test_windowed_distinct_hot_split_parity(tdf):
    """distinct through the hot-entity split path (halo-exact for bounded
    windows) must equal the default plan; expanding distinct must REJECT
    hot_threshold (set-valued carries are unbounded)."""
    from nvtabular_ray.pipelines.temporal import expanding_agg

    base = (
        windowed_agg(_ds(tdf), "conv_id", "ts", "tool", 600, ["distinct"], num_buckets=8)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    hot = (
        windowed_agg(
            _ds(tdf), "conv_id", "ts", "tool", 600, ["distinct"],
            num_buckets=4, hot_threshold=50, target_seg_rows=40,
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        base["tool_w600s_distinct"], hot["tool_w600s_distinct"]
    )
    with pytest.raises(ValueError, match="unsupported aggs"):
        expanding_agg(
            _ds(tdf), "conv_id", "ts", "tool", ["distinct"], hot_threshold=50
        )


def test_distinct_over_bounds_tie_and_null_edges():
    """Hand case: ties at the window edge, null runs, single-row groups."""
    from nvtabular_ray.functions.grouped_np import (
        dict_codes,
        distinct_over_bounds,
        grouped_window_bounds,
    )

    gid = np.array([0, 0, 0, 0, 0, 1, 2, 2], dtype=np.int64)
    ts = np.array([0, 10, 10, 15, 30, 5, 1, 2], dtype=np.int64)
    vals = pa.chunked_array([pa.array(["a", None, "b", "a", "c", None, "x", "x"])])
    codes, valid = dict_codes(vals)
    w, e = grouped_window_bounds(ts, gid, 10)
    got = distinct_over_bounds(codes, valid, w, e, gid)
    # row0: {a}=1; rows1,2 (peers at ts=10, window [0,10]): {a,b}=2
    # row3 (ts=15, window [5,15]): {b,a}=2; row4 (ts=30, window [20,30]): {c}=1
    # row5: all-null window -> 0; rows6,7: {x}=1 each
    np.testing.assert_array_equal(got, [1, 2, 2, 2, 1, 0, 1, 1])


def test_resample_grid_locf():
    from nvtabular_ray.pipelines.temporal import resample_grid

    df = pd.DataFrame(
        {
            "e": ["a"] * 3 + ["b"] * 2 + ["c"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:30", "2024-01-01 02:10", "2024-01-01 03:00",
                    "2024-01-01 01:00", "2024-01-01 01:30",
                    "2024-01-01 00:10",
                ]
            ),
            "v": [1.0, 2.0, None, 10.0, 20.0, 5.0],
        }
    )
    out = (
        resample_grid(_ds(df, 3), "e", "ts", ["v"], 3600)
        .to_pandas()
        .sort_values(["e", "grid_ts"])
        .reset_index(drop=True)
    )
    # a: ticks 01,02,03 -> LOCF 1.0 (00:30), 1.0, None (03:00 row is null)
    # b: tick 01 (exactly on an obs) -> 10.0 ; span ends 01:30 so one tick
    # c: span [00:10, 00:10] -> first tick 01:00 > tmax -> no rows
    a = out[out.e == "a"]
    assert list(a["grid_ts"].dt.hour) == [1, 2, 3]
    assert a["v"].tolist()[:2] == [1.0, 1.0] and pd.isna(a["v"].tolist()[2])
    b = out[out.e == "b"]
    assert list(b["grid_ts"].dt.hour) == [1] and b["v"].tolist() == [10.0]
    assert (out.e == "c").sum() == 0
