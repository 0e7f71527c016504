"""LastWhere (conditional last value strictly before the row) and Ewma
(trailing exponentially weighted mean) vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


@pytest.fixture()
def df():
    rng = np.random.default_rng(11)
    n = 6000
    return pd.DataFrame(
        {
            "u": rng.integers(0, 50, n),
            "ts": rng.integers(0, 10**6, n),
            "rid": np.arange(n, dtype=np.int64),
            "is_tool": rng.random(n) < 0.3,
            "tool": rng.choice(["a", "b", "c"], n),
            "x": np.where(rng.random(n) < 0.05, np.nan, rng.normal(size=n) * 10),
        }
    )


def _run(df, node):
    return (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )


def test_last_where_matches_pandas(ray_session, df):
    out = _run(
        df,
        ["tool", "x", "ts"]
        >> ops.LastWhere("u", cond_col="is_tool", sort_cols=["ts", "rid"]),
    )
    # ROW-level oracle: every output column comes from the SAME matched row
    # (the last cond row strictly before), so a NaN value AT a matching row
    # is returned as-is — unlike SQL IGNORE NULLS, which would skip it
    # per-column (the two coincide when matched rows are non-null)
    exp = df.sort_values(["u", "ts", "rid"]).copy()
    ridx = pd.Series(
        np.arange(len(exp), dtype=np.float64), index=exp.index
    ).where(exp["is_tool"])
    last_idx = (
        ridx.groupby(exp["u"].to_numpy())
        .apply(lambda s: s.shift(1).ffill())
        .reset_index(level=0, drop=True)
        .reindex(exp.index)
    )
    for c in ["tool", "x", "ts"]:
        vals = exp[c].to_numpy()
        li = last_idx.to_numpy()
        got = np.array(
            [vals[int(i)] if not np.isnan(i) else None for i in li], dtype=object
        )
        exp[f"{c}_last_where"] = got
    exp = exp.sort_values("rid").reset_index(drop=True)
    for c in ["tool", "x", "ts"]:
        a, b = out[f"{c}_last_where"], exp[f"{c}_last_where"]
        b_isna = b.isna() | b.apply(
            lambda v: isinstance(v, float) and np.isnan(v)
        )
        assert (a.isna() == b_isna).all(), c
        m = ~a.isna()
        if a.dtype == object:
            assert (a[m] == b[m]).all(), c
        else:
            np.testing.assert_allclose(
                a[m].astype(float), b[m].astype(float).to_numpy()
            )


def test_last_where_include_current(ray_session, df):
    out = _run(
        df,
        ["tool"]
        >> ops.LastWhere(
            "u", cond_col="is_tool", sort_cols=["ts", "rid"], include_current=True
        ),
    )
    exp = df.sort_values(["u", "ts", "rid"]).copy()
    masked = exp["tool"].where(exp["is_tool"])
    exp["e"] = masked.groupby(exp["u"]).ffill()
    exp = exp.sort_values("rid").reset_index(drop=True)
    a = out["tool_last_where"]
    assert (a.isna() == exp["e"].isna()).all()
    m = ~a.isna()
    assert (a[m] == exp["e"][m]).all()


def test_last_where_null_cond_is_false(ray_session):
    df = pd.DataFrame(
        {
            "u": [1, 1, 1],
            "ts": [1, 2, 3],
            "rid": [0, 1, 2],
            "c": pd.array([True, None, True], dtype="boolean"),
            "v": [10.0, 20.0, 30.0],
        }
    )
    out = _run(df, ["v"] >> ops.LastWhere("u", cond_col="c", sort_cols=["ts", "rid"]))
    assert out["v_last_where"].tolist()[0] != out["v_last_where"].tolist()[0] or pd.isna(
        out["v_last_where"][0]
    )
    assert out["v_last_where"][1] == 10.0  # null cond row sees row 0
    assert out["v_last_where"][2] == 10.0  # row 1's null cond did NOT match


@pytest.mark.parametrize("adjust", [False, True])
def test_ewma_matches_pandas(ray_session, df, adjust):
    out = _run(
        df, ["x"] >> ops.Ewma("u", alpha=0.3, sort_cols=["ts", "rid"], adjust=adjust)
    )
    exp = df.sort_values(["u", "ts", "rid"]).copy()
    exp["e"] = exp.groupby("u")["x"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=adjust).mean()
    )
    exp = exp.sort_values("rid").reset_index(drop=True)
    a, b = out["x_ewma"].to_numpy(), exp["e"].to_numpy()
    assert (np.isnan(a) == np.isnan(b)).all()
    np.testing.assert_allclose(a[~np.isnan(a)], b[~np.isnan(b)])


def test_ewma_alpha_validation():
    with pytest.raises(ValueError):
        ops.Ewma("u", alpha=0.0)
    with pytest.raises(ValueError):
        ops.Ewma("u", alpha=1.5)


def test_rolling_first_last_matches_bruteforce(ray_session):
    rng = np.random.default_rng(4)
    n = 3000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 30, n),
            "ts": pd.to_datetime(rng.integers(0, 10**5, n), unit="s"),
            "rid": np.arange(n, dtype=np.int64),
            "x": rng.normal(size=n),
        }
    )
    node = ["x"] >> ops.RollingAgg(
        "u", "ts", 600, aggs=("first", "last"), tie_cols=["rid"]
    )
    out = _run(df, node)
    srt = df.sort_values(["u", "ts", "rid"]).reset_index(drop=True)
    firsts, lasts = {}, {}
    for _, g in srt.groupby("u"):
        ts = g["ts"].astype("int64").to_numpy()
        xs = g["x"].to_numpy()
        rids = g["rid"].to_numpy()
        for i in range(len(g)):
            m = (ts >= ts[i] - 600 * 10**9) & (ts <= ts[i])
            idxs = np.flatnonzero(m)
            firsts[rids[i]] = xs[idxs[0]]
            lasts[rids[i]] = xs[idxs[-1]]
    np.testing.assert_allclose(
        out["x_w600s_first"], [firsts[r] for r in out["rid"]]
    )
    np.testing.assert_allclose(out["x_w600s_last"], [lasts[r] for r in out["rid"]])


def test_sessionize_emit_features(ray_session):
    rng = np.random.default_rng(9)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, n),
            "ts": pd.to_datetime(np.sort(rng.integers(0, 10**6, n)), unit="s"),
            "rid": np.arange(n, dtype=np.int64),
        }
    ).sample(frac=1.0, random_state=1).reset_index(drop=True)
    node = ["ts"] >> ops.Sessionize(
        "u", "ts", gap=300,
        emit=("turn_in_session", "sec_since_session_start"), tie_cols=["rid"]
    )
    out = _run(df, node)
    srt = df.sort_values(["u", "ts", "rid"]).copy()
    brk = (srt["ts"].diff().dt.total_seconds() > 300) & (srt["u"] == srt["u"].shift())
    newent = srt["u"] != srt["u"].shift()
    srt["sid"] = ((brk | newent).groupby(srt["u"].to_numpy()).cumsum() - 1).to_numpy()
    srt["tis"] = srt.groupby(["u", "sid"]).cumcount()
    srt["sss"] = (
        srt["ts"] - srt.groupby(["u", "sid"])["ts"].transform("first")
    ).dt.total_seconds()
    srt = srt.sort_values("rid").reset_index(drop=True)
    np.testing.assert_array_equal(out["session_id"], srt["sid"])
    np.testing.assert_array_equal(out["turn_in_session"], srt["tis"])
    np.testing.assert_allclose(out["sec_since_session_start"], srt["sss"])


def _hot_cold_frame(seed=6):
    rng = np.random.default_rng(seed)
    hot = pd.DataFrame(
        {
            "u": "hot",
            "ts": pd.to_datetime(np.cumsum(rng.integers(1, 100, 3000)), unit="s"),
            "is_t": rng.random(3000) < 0.2,
            "x": rng.normal(size=3000),
        }
    )
    colds = [
        pd.DataFrame(
            {
                "u": f"c{i}",
                "ts": pd.to_datetime(np.cumsum(rng.integers(1, 100, 50)), unit="s"),
                "is_t": rng.random(50) < 0.2,
                "x": rng.normal(size=50),
            }
        )
        for i in range(20)
    ]
    df = pd.concat([hot] + colds, ignore_index=True)
    df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
    df["rid"] = np.arange(len(df), dtype=np.int64)
    return df


@pytest.mark.parametrize(
    "fn_name,kw,outc",
    [
        ("shift_values", dict(cols="x", shift=[1, -1]), ["x_shift_1", "x_shift_-1"]),
        ("last_where", dict(cols="x", cond_col="is_t"), ["x_last_where"]),
        ("ewma", dict(cols="x", alpha=0.3), ["x_ewma"]),
    ],
)
def test_functional_apis_hot_threshold_parity(ray_session, fn_name, kw, outc):
    from nvtabular_ray.pipelines import temporal as T

    fn = getattr(T, fn_name)
    df = _hot_cold_frame()

    def collect(out):
        return out.to_pandas().sort_values("rid").reset_index(drop=True)

    a = collect(fn(rd.from_pandas(df).repartition(4), "u", "ts", sort_cols=["rid"], **kw))
    b = collect(
        fn(
            rd.from_pandas(df).repartition(4),
            "u",
            "ts",
            sort_cols=["rid"],
            hot_threshold=500,
            target_seg_rows=400,
            **kw,
        )
    )
    for c in outc:
        x = a[c].to_numpy(dtype=np.float64, na_value=np.nan)
        y = b[c].to_numpy(dtype=np.float64, na_value=np.nan)
        assert (np.isnan(x) == np.isnan(y)).all(), c
        np.testing.assert_allclose(x[~np.isnan(x)], y[~np.isnan(y)], err_msg=c)


def test_ewma_time_decay_matches_pandas(ray_session):
    rng = np.random.default_rng(13)
    n = 5000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 40, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "rid": np.arange(n, dtype=np.int64),
            "x": np.where(rng.random(n) < 0.05, np.nan, rng.normal(size=n)),
        }
    )
    node = ["x"] >> ops.Ewma(
        "u", halflife=600.0, ts_col="ts", sort_cols=["rid"]
    )
    out = _run(df, node)
    exp = np.empty(n)
    srt = df.sort_values(["u", "ts", "rid"])
    for _, g in srt.groupby("u"):
        e = g["x"].ewm(halflife=pd.Timedelta("600s"), times=g["ts"]).mean()
        exp[g["rid"].to_numpy()] = e.to_numpy()
    got = out.sort_values("rid")["x_ewma"].to_numpy()
    assert (np.isnan(got) == np.isnan(exp)).all()
    m = ~np.isnan(got)
    np.testing.assert_allclose(got[m], exp[m], rtol=1e-10)


def test_ewma_mode_validation():
    with pytest.raises(ValueError):
        ops.Ewma("u")  # neither mode
    with pytest.raises(ValueError):
        ops.Ewma("u", alpha=0.3, halflife=60.0)  # both
    with pytest.raises(ValueError):
        ops.Ewma("u", halflife=60.0)  # missing ts_col


def test_expanding_first_last_matches_bruteforce(ray_session):
    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 30, n),
            "ts": rng.integers(0, 5000, n),  # heavy ties
            "rid": np.arange(n, dtype=np.int64),
            "x": rng.normal(size=n),
        }
    )
    node = ["x"] >> ops.ExpandingAgg(
        "u", "ts", aggs=("first", "last", "count"), tie_cols=["rid"]
    )
    out = _run(df, node)
    srt = df.sort_values(["u", "ts", "rid"]).reset_index(drop=True)
    firsts, lasts = {}, {}
    for _, g in srt.groupby("u"):
        ts = g["ts"].to_numpy()
        xs = g["x"].to_numpy()
        rid = g["rid"].to_numpy()
        for i in range(len(g)):
            idxs = np.flatnonzero(ts < ts[i])  # equal-ts peers excluded
            firsts[rid[i]] = xs[idxs[0]] if len(idxs) else np.nan
            lasts[rid[i]] = xs[idxs[-1]] if len(idxs) else np.nan
    for col, exp in (("x_cum_first", firsts), ("x_cum_last", lasts)):
        a = out[col].to_numpy()
        e = np.array([exp[r] for r in out["rid"]])
        assert (np.isnan(a) == np.isnan(e)).all(), col
        np.testing.assert_allclose(a[~np.isnan(a)], e[~np.isnan(e)], err_msg=col)
