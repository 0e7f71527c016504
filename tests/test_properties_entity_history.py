"""Adversarial property tests for the round-5 entity-history operators:
Shift / LastWhere / Ewma vs pandas oracles on tiny frames with ts ties,
nulls in keys/conditions/values, single-row groups and empty conditions.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nvtabular_ray import Workflow, ops


@st.composite
def _frames(draw):
    n_entities = draw(st.integers(1, 4))
    frames = []
    rid = 0
    for e in range(n_entities):
        n = draw(st.integers(1, 60))
        gaps = draw(st.lists(st.integers(0, 50), min_size=n, max_size=n))
        ts = np.cumsum(np.asarray(gaps, dtype=np.int64))
        nulls = np.asarray(draw(st.lists(st.booleans(), min_size=n, max_size=n)))
        conds = np.asarray(draw(st.lists(st.booleans(), min_size=n, max_size=n)))
        val = np.arange(n, dtype=np.float64) * 0.5 - 3.0
        val[nulls] = np.nan
        frames.append(
            pd.DataFrame(
                {
                    "k": f"e{e}",
                    "ts": ts,
                    "rid": np.arange(rid, rid + n, dtype=np.int64),
                    "c": conds,
                    "val": val,
                }
            )
        )
        rid += n
    df = pd.concat(frames, ignore_index=True)
    return df.sample(frac=1.0, random_state=0).reset_index(drop=True)


def _run(df, node):
    ds = rd.from_pandas(df).repartition(3)
    return (
        Workflow(node + ["rid"])
        .fit(ds)
        .transform(ds)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )


@settings(max_examples=8, deadline=None)
@given(_frames(), st.sampled_from([1, 2, -1]))
def test_shift_property(df, k):
    out = _run(df, ["val"] >> ops.Shift("k", shift=k, sort_cols=["ts", "rid"]))
    exp = (
        df.sort_values(["k", "ts", "rid"])
        .assign(e=lambda d: d.groupby("k")["val"].shift(k))
        .sort_values("rid")["e"]
        .reset_index(drop=True)
    )
    got = out[f"val_shift_{k}"]
    assert (got.isna() == exp.isna()).all()
    m = ~got.isna()
    np.testing.assert_allclose(got[m], exp[m])


@settings(max_examples=8, deadline=None)
@given(_frames())
def test_last_where_property(df):
    out = _run(df, ["val"] >> ops.LastWhere("k", cond_col="c", sort_cols=["ts", "rid"]))
    srt = df.sort_values(["k", "ts", "rid"])
    ridx = pd.Series(np.arange(len(srt), dtype=np.float64), index=srt.index).where(
        srt["c"]
    )
    last_idx = (
        ridx.groupby(srt["k"].to_numpy())
        .apply(lambda s: s.shift(1).ffill())
        .reset_index(level=0, drop=True)
        .reindex(srt.index)
    )
    vals = srt["val"].to_numpy()
    li = last_idx.to_numpy()
    exp = np.array([vals[int(i)] if not np.isnan(i) else np.nan for i in li])
    exp_ser = pd.Series(exp, index=srt.index).reindex(df.index)
    exp_sorted = (
        pd.DataFrame({"rid": df["rid"], "e": exp_ser})
        .sort_values("rid")["e"]
        .reset_index(drop=True)
    )
    got = out["val_last_where"]
    assert (got.isna() == exp_sorted.isna()).all()
    m = ~got.isna()
    np.testing.assert_allclose(got[m], exp_sorted[m])


@settings(max_examples=6, deadline=None)
@given(_frames(), st.sampled_from([0.2, 0.9, 1.0]))
def test_ewma_alpha_property(df, alpha):
    out = _run(df, ["val"] >> ops.Ewma("k", alpha=alpha, sort_cols=["ts", "rid"]))
    exp = (
        df.sort_values(["k", "ts", "rid"])
        .groupby("k")["val"]
        .transform(lambda s: s.ewm(alpha=alpha, adjust=False).mean())
        .reindex(df.index)
    )
    exp_sorted = (
        pd.DataFrame({"rid": df["rid"], "e": exp})
        .sort_values("rid")["e"]
        .reset_index(drop=True)
    )
    got = out["val_ewma"].to_numpy()
    e = exp_sorted.to_numpy()
    assert (np.isnan(got) == np.isnan(e)).all()
    m = ~np.isnan(got)
    np.testing.assert_allclose(got[m], e[m])


@settings(max_examples=6, deadline=None)
@given(_frames())
def test_ewma_halflife_property(df):
    df = df.copy()
    df["tsd"] = pd.to_datetime(df["ts"] + df["rid"] % 7, unit="s")
    out = _run(
        df, ["val"] >> ops.Ewma("k", halflife=30.0, ts_col="tsd", sort_cols=["rid"])
    )
    srt = df.sort_values(["k", "tsd", "rid"])
    exp = np.empty(len(df))
    for _, grp in srt.groupby("k"):
        e = grp["val"].ewm(halflife=pd.Timedelta("30s"), times=grp["tsd"]).mean()
        exp[grp["rid"].to_numpy()] = e.to_numpy()
    got = out.sort_values("rid")["val_ewma"].to_numpy()
    exp = exp[out.sort_values("rid")["rid"].to_numpy()]
    assert (np.isnan(got) == np.isnan(exp)).all()
    m = ~np.isnan(got)
    np.testing.assert_allclose(got[m], exp[m], rtol=1e-9)
