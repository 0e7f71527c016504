"""JoinGroupby / TargetEncoding / JoinExternal / Groupby / DifferenceLag vs
pandas oracles (reference tests/unit/ops/test_join.py, test_target_encode.py,
test_groupyby.py semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import ColumnSelector, Workflow, ops


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


@pytest.fixture()
def session_df():
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "user": rng.choice(["u1", "u2", "u3", "u4"], n),
            "ts": rng.permutation(n).astype("int64"),
            "x": rng.normal(0, 1, n),
            "y": rng.randint(0, 100, n).astype("int64"),
            "label": rng.randint(0, 2, n).astype("int64"),
            "row_id": np.arange(n, dtype="int64"),
        }
    )
    return df


def test_join_groupby_stats(session_df):
    node = ["user"] >> ops.JoinGroupby(cont_cols=["x"], stats=["count", "sum", "mean", "std"])
    wf = Workflow(node + ["row_id"])
    out = (
        wf.fit(_ds(session_df))
        .transform(_ds(session_df))
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    g = session_df.groupby("user")["x"]
    oracle_mean = session_df["user"].map(g.mean())
    oracle_std = session_df["user"].map(g.std(ddof=1))
    oracle_count = session_df["user"].map(g.count() + session_df.groupby("user").size() - g.count())
    np.testing.assert_allclose(out["user_x_mean"], oracle_mean.astype("float32"), rtol=1e-5)
    np.testing.assert_allclose(out["user_x_std"], oracle_std.astype("float32"), rtol=1e-5)
    np.testing.assert_array_equal(out["user_count"], session_df["user"].map(session_df.groupby("user").size()).astype("int32"))
    assert out["user_count"].dtype == np.int32
    assert out["user_x_mean"].dtype == np.float32


def test_target_encoding_formula(session_df):
    p = 20
    node = ["user"] >> ops.TargetEncoding("label", kfold=3, p_smooth=p, fold_on=["row_id"])
    wf = Workflow(node + ["row_id", "user", "label"])
    out = (
        wf.fit(_ds(session_df))
        .transform(_ds(session_df))
        .to_pandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    te_op = [n.op for n in wf._op_nodes() if isinstance(n.op, ops.TargetEncoding)][0]
    gmean = session_df["label"].mean()
    assert te_op.global_mean == pytest.approx(gmean, rel=1e-12)

    # oracle: leave-one-fold-out with the same hash-derived folds
    from nvtabular_ray.ops.target_encoding import FOLD_NAME
    from nvtabular_ray.functions.hashing import hash64_columns_stable

    df = session_df.sort_values("row_id").reset_index(drop=True)
    h = hash64_columns_stable(pa.Table.from_pandas(df, preserve_index=False), ["row_id"])
    h = h ^ np.uint64(42 * 0x9E3779B97F4A7C15 % (1 << 64))
    df[FOLD_NAME] = (h % np.uint64(3)).astype("int64")
    stats = df.groupby(["user", FOLD_NAME])["label"].agg(["count", "sum"]).reset_index()
    allstats = df.groupby("user")["label"].agg(["count", "sum"]).reset_index()
    m = df.merge(stats, on=["user", FOLD_NAME], how="left").merge(
        allstats, on="user", how="left", suffixes=("_fold", "_all")
    )
    te_oracle = ((m["sum_all"] - m["sum_fold"]) + p * gmean) / (
        (m["count_all"] - m["count_fold"]) + p
    )
    np.testing.assert_allclose(out["TE_user_label"], te_oracle.astype("float32"), rtol=1e-5)
    # out-of-fold: a feature at row r must not include row r's own label
    assert not np.allclose(
        out["TE_user_label"],
        (m["sum_all"] + p * gmean) / (m["count_all"] + p),
    )


def test_target_encoding_multi_and_unseen(session_df):
    node = [["user"]] >> ops.TargetEncoding("label", kfold=1, p_smooth=10)
    wf = Workflow(node)
    wf.fit(_ds(session_df))
    new = pd.DataFrame({"user": ["u1", "unknown"], "label": [0, 0]})
    out = wf.transform(_ds(new, 1)).to_pandas()
    gmean = session_df["label"].mean()
    g = session_df.groupby("user")["label"].agg(["count", "sum"]).loc["u1"]
    expected = (g["sum"] + 10 * gmean) / (g["count"] + 10)
    assert out["TE_user_label"][0] == pytest.approx(expected, rel=1e-5)
    assert out["TE_user_label"][1] == pytest.approx(gmean, rel=1e-5)


def test_join_external(session_df):
    ext = pd.DataFrame({"user": ["u1", "u2", "u3", "u4"], "tier": [1, 2, 3, 4]})
    node = ["user", "row_id"] >> ops.JoinExternal(ext, on="user")
    out = Workflow(node).fit(_ds(session_df)).transform(_ds(session_df)).to_pandas()
    oracle = session_df.merge(ext, on="user", how="left")
    assert len(out) == len(session_df)
    m = out.sort_values("row_id")["tier"].to_numpy()
    o = oracle.sort_values("row_id")["tier"].to_numpy()
    np.testing.assert_array_equal(m, o)


def test_groupby_dataset_level(session_df):
    node = ["user", "ts", "x", "y"] >> ops.Groupby(
        groupby_cols="user",
        sort_cols="ts",
        aggs={"x": ["list", "first", "last", "sum", "count"], "y": ["max"], "ts": ["list"]},
    )
    out = Workflow(node).fit(_ds(session_df)).transform(_ds(session_df)).to_pandas()
    out = out.sort_values("user").reset_index(drop=True)
    oracle = session_df.sort_values(["user", "ts"], kind="mergesort")
    g = oracle.groupby("user")
    assert len(out) == 4
    for _, row in out.iterrows():
        grp = oracle[oracle["user"] == row["user"]]
        assert list(row["ts_list"]) == list(grp["ts"])  # list agg ordered by ts
        assert row["x_first"] == pytest.approx(grp["x"].iloc[0])
        assert row["x_last"] == pytest.approx(grp["x"].iloc[-1])
        assert row["x_sum"] == pytest.approx(grp["x"].sum(), rel=1e-5)
        assert row["x_count"] == len(grp)
        assert row["y_max"] == grp["y"].max()
    assert out["x_count"].dtype == np.int32
    assert out["x_sum"].dtype == np.float32


def test_difference_lag(session_df):
    node = ["x"] >> ops.DifferenceLag(partition_cols="user", shift=[1, -1], sort_cols=["ts"])
    wf = Workflow(node + ["user", "ts", "row_id"])
    out = (
        wf.fit(_ds(session_df))
        .transform(_ds(session_df))
        .to_pandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    oracle = session_df.sort_values(["user", "ts"], kind="mergesort").reset_index(drop=True)
    g = oracle.groupby("user")["x"]
    lag1 = (oracle["x"] - g.shift(1)).astype("float32")
    lead1 = (oracle["x"] - g.shift(-1)).astype("float32")
    np.testing.assert_allclose(
        out["x_difference_lag_1"], lag1, rtol=1e-5, equal_nan=True
    )
    np.testing.assert_allclose(
        out["x_difference_lag_-1"], lead1, rtol=1e-5, equal_nan=True
    )
    # boundary rows (first per user) must be null
    firsts = out.groupby("user").head(1)
    assert firsts["x_difference_lag_1"].isna().all()


def test_groupby_first_last_on_list_columns():
    """Reference parity: first/last of a LIST column takes the literal
    first/last row's list (groupby.py:290-319)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "t": pa.array([1, 2, 1]),
            "lv": pa.array([[1, 2], [3], [4, 5, 6]], pa.list_(pa.int64())),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    node = ["k", "t", "lv"] >> ops.Groupby(
        groupby_cols="k", sort_cols="t", aggs={"lv": ["first", "last"]}
    )
    out = Workflow(node).fit(ds).transform(ds).to_pandas().sort_values("k")
    got = [(r["k"], list(r["lv_first"]), list(r["lv_last"])) for r in out.to_dict("records")]
    assert got == [("a", [1, 2], [3]), ("b", [4, 5, 6], [4, 5, 6])]
