"""Multi-target TargetEncoding: one stat pass, one TE column per target.

Contract (reference nvtabular/ops/target_encoding.py:243-245,297-312): with
target=[a, b], output columns TE_{group}_{a} and TE_{group}_{b}, each equal
to what a single-target op on that target alone would produce (targets here
have no nulls, where the two definitions coincide).
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


@pytest.fixture()
def df():
    rng = np.random.default_rng(7)
    n = 4000
    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "cat": rng.integers(0, 37, n).astype(str),
            "cat2": rng.integers(0, 5, n).astype(str),
            "y1": rng.normal(10.0, 3.0, n),
            "y2": rng.exponential(2.0, n),
        }
    )


def _run(df, node, keep=("row_id",)):
    wf = Workflow(node + list(keep))
    ds = rd.from_pandas(df)
    return (
        wf.fit(ds).transform(ds).to_pandas().sort_values("row_id").reset_index(drop=True),
        wf,
    )


@pytest.mark.parametrize("kfold", [1, 3])
def test_multi_target_matches_per_target(ray_session, df, kfold):
    multi, wf = _run(
        df,
        ["cat"]
        >> ops.TargetEncoding(
            ["y1", "y2"], kfold=kfold, fold_on=["row_id"], p_smooth=20, out_dtype="float64"
        ),
    )
    for t in ["y1", "y2"]:
        single, _ = _run(
            df,
            ["cat"]
            >> ops.TargetEncoding(
                t, kfold=kfold, fold_on=["row_id"], p_smooth=20, out_dtype="float64"
            ),
        )
        np.testing.assert_allclose(
            multi[f"TE_cat_{t}"], single[f"TE_cat_{t}"], rtol=0, atol=0
        )
    te_op = [n.op for n in wf._op_nodes() if isinstance(n.op, ops.TargetEncoding)][0]
    assert te_op.global_means["y1"] == pytest.approx(df["y1"].mean(), rel=1e-12)
    assert te_op.global_means["y2"] == pytest.approx(df["y2"].mean(), rel=1e-12)
    # back-compat scalar alias = first target
    assert te_op.global_mean == te_op.global_means["y1"]


@pytest.mark.parametrize("kfold", [1, 3])
def test_multi_target_distributed_matches_broadcast(ray_session, df, kfold):
    broadcast, _ = _run(
        df,
        ["cat"]
        >> ops.TargetEncoding(
            ["y1", "y2"], kfold=kfold, fold_on=["row_id"], p_smooth=20, out_dtype="float64"
        ),
    )
    dist, _ = _run(
        df,
        ["cat"]
        >> ops.TargetEncoding(
            ["y1", "y2"],
            kfold=kfold,
            fold_on=["row_id"],
            p_smooth=20,
            out_dtype="float64",
            distributed=True,
            split_out=4,
        ),
    )
    for t in ["y1", "y2"]:
        np.testing.assert_allclose(
            broadcast[f"TE_cat_{t}"], dist[f"TE_cat_{t}"], rtol=1e-12
        )


def test_multi_target_multi_group(ray_session, df):
    out, _ = _run(
        df,
        [["cat", "cat2"]]
        >> ops.TargetEncoding(["y1", "y2"], kfold=1, p_smooth=20, out_dtype="float64"),
    )
    assert {"TE_cat_cat2_y1", "TE_cat_cat2_y2"} <= set(out.columns)
    # spot-check the closed form for one composite key
    sub = df[(df["cat"] == df["cat"].iloc[0]) & (df["cat2"] == df["cat2"].iloc[0])]
    expect = (sub["y2"].sum() + 20 * df["y2"].mean()) / (len(sub) + 20)
    got = out.loc[
        (df.sort_values("row_id")["cat"].values == df["cat"].iloc[0])
        & (df.sort_values("row_id")["cat2"].values == df["cat2"].iloc[0]),
        "TE_cat_cat2_y2",
    ].iloc[0]
    assert got == pytest.approx(expect, rel=1e-12)


def test_multi_target_null_target_counts_per_target(ray_session, df):
    """Per-target non-null counts: a null in y1 must not dilute y2's TE
    (documented divergence from the reference's shared count_y)."""
    df = df.copy()
    df.loc[df.index[:500], "y1"] = np.nan
    out, _ = _run(
        df,
        ["cat"] >> ops.TargetEncoding(["y1", "y2"], kfold=1, p_smooth=20, out_dtype="float64"),
    )
    single, _ = _run(
        df, ["cat"] >> ops.TargetEncoding("y2", kfold=1, p_smooth=20, out_dtype="float64")
    )
    np.testing.assert_allclose(out["TE_cat_y2"], single["TE_cat_y2"], rtol=0, atol=0)


def test_multi_target_serving_without_labels(ray_session, df):
    node = ["cat"] >> ops.TargetEncoding(
        ["y1", "y2"], kfold=3, fold_on=["row_id"], p_smooth=20, out_dtype="float64"
    )
    wf = Workflow(node + ["row_id"])
    wf.fit(rd.from_pandas(df))
    serve = wf.transform(df.drop(columns=["y1", "y2"]))
    # label-free: global (non-fold-subtracted) stats per target
    st = df.groupby("cat")[["y1", "y2"]].agg(["sum", "count"])
    for t in ["y1", "y2"]:
        expect = (
            df["cat"].map((st[(t, "sum")] + 20 * df[t].mean()) / (st[(t, "count")] + 20))
        ).values
        np.testing.assert_allclose(
            serve.sort_values("row_id")[f"TE_cat_{t}"].values, expect, rtol=1e-12
        )


def test_multi_target_guards(ray_session):
    with pytest.raises(ValueError, match="fold_on"):
        ops.TargetEncoding(["a", "b"], kfold=3, fold_on=["a", "rid"])
    with pytest.raises(ValueError, match="out_col"):
        ops.TargetEncoding(["a", "b"], kfold=1, out_col="x")
    with pytest.raises(ValueError, match="duplicate"):
        ops.TargetEncoding(["a", "a"], kfold=1)


def test_multi_target_save_load_roundtrip(ray_session, df, tmp_path):
    from nvtabular_ray.state.artifacts import load_workflow, save_workflow

    node = ["cat"] >> ops.TargetEncoding(
        ["y1", "y2"], kfold=3, fold_on=["row_id"], p_smooth=20, out_dtype="float64"
    )
    wf = Workflow(node + ["row_id"])
    ds = rd.from_pandas(df)
    out1 = wf.fit(ds).transform(ds).to_pandas().sort_values("row_id").reset_index(drop=True)
    save_workflow(wf, str(tmp_path / "wf"))
    wf2 = load_workflow(str(tmp_path / "wf"))
    out2 = wf2.transform(ds).to_pandas().sort_values("row_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out2)
