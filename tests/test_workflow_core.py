"""Core DAG / workflow / stateless+stat op tests vs pandas oracles
(the reference's assert_eq discipline, tests/conftest.py:44-51)."""

import numpy as np
import pandas as pd
import pytest

from nvtabular_ray import Workflow, ops


def _out_df(wf, ds, **kw):
    out = wf.transform(ds, **kw).to_pandas()
    return out


def test_fill_clip_log_chain(mixed_ds, mixed_df):
    conts = ["x", "y"] >> ops.FillMissing(0) >> ops.Clip(min_value=0) >> ops.LogOp()
    wf = Workflow(conts + ["id"])
    wf.fit(mixed_ds)
    out = _out_df(wf, mixed_ds).sort_values("id", kind="mergesort").reset_index(drop=True)

    oracle = mixed_df.copy()
    for c in ("x", "y"):
        v = oracle[c].fillna(0).clip(lower=0)
        # ln at float64 precision, float32 on the output (LogOp contract)
        oracle[c] = np.log(v.astype("float64") + 1).astype("float32")
    oracle = (
        oracle[["x", "y", "id"]].sort_values("id", kind="mergesort").reset_index(drop=True)
    )
    np.testing.assert_allclose(out["x"], oracle["x"], rtol=1e-6)
    np.testing.assert_allclose(out["y"], oracle["y"], rtol=1e-6)
    assert list(out.columns) == ["x", "y", "id"]


def test_normalize_matches_pandas(mixed_ds, mixed_df):
    wf = Workflow(["x", "z"] >> ops.Normalize())
    wf.fit(mixed_ds)
    node_op = wf._op_nodes()[0].op
    assert node_op.means["x"] == pytest.approx(mixed_df["x"].mean(), rel=1e-9)
    assert node_op.stds["z"] == pytest.approx(mixed_df["z"].std(ddof=1), rel=1e-9)

    out = _out_df(wf, mixed_ds)
    oracle_x = (mixed_df["x"] - mixed_df["x"].mean()) / mixed_df["x"].std(ddof=1)
    np.testing.assert_allclose(
        np.sort(out["x"].dropna()), np.sort(oracle_x.dropna()), rtol=1e-9
    )


def test_normalize_minmax(mixed_ds, mixed_df):
    wf = Workflow(["y"] >> ops.NormalizeMinMax())
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    o = (mixed_df["y"] - mixed_df["y"].min()) / (mixed_df["y"].max() - mixed_df["y"].min())
    np.testing.assert_allclose(np.sort(out["y"].dropna()), np.sort(o.dropna()), rtol=1e-9)


def test_fill_median_exact(mixed_ds, mixed_df):
    wf = Workflow(["x", "y", "z"] >> ops.FillMedian())
    wf.fit(mixed_ds)
    op = wf._op_nodes()[0].op
    for c in ("x", "y", "z"):
        assert op.medians[c] == pytest.approx(mixed_df[c].median(), rel=1e-12), c


def test_quantile_bucketize(mixed_ds, mixed_df):
    wf = Workflow(["x", "y"] >> ops.QuantileBucketize(num_buckets=4))
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    op = wf._op_nodes()[0].op
    for c in ("x", "y"):
        cuts = np.quantile(mixed_df[c].dropna(), [0.25, 0.5, 0.75])
        np.testing.assert_allclose(op.boundaries[c], cuts, rtol=1e-12)
        exp = np.digitize(mixed_df[c].to_numpy(dtype=np.float64), cuts, right=False)
        got = out[c].to_numpy(dtype="float64", na_value=np.nan)
        mask = mixed_df[c].notna().to_numpy()
        np.testing.assert_array_equal(got[mask], exp[mask].astype(np.float64))
        assert np.isnan(got[~mask]).all()  # nulls stay null
    # every non-empty bucket roughly equal frequency
    counts = out["y"].value_counts()
    assert counts.max() - counts.min() <= max(2, len(mixed_df) // 10)


def test_fill_missing_indicator(mixed_ds, mixed_df):
    wf = Workflow(["x"] >> ops.FillMissing(fill_val=-1, add_binary_cols=True))
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert out["x_filled"].sum() == mixed_df["x"].isna().sum()
    assert (out["x"] == -1).sum() == mixed_df["x"].isna().sum()


def test_bucketize_and_rename(mixed_ds, mixed_df):
    node = ["y"] >> ops.Bucketize([25.0, 50.0, 75.0]) >> ops.Rename(postfix="_bin")
    out = Workflow(node).fit(mixed_ds).transform(mixed_ds).to_pandas()
    oracle = np.digitize(mixed_df["y"].to_numpy(), [25.0, 50.0, 75.0])
    # NaN digitizes to the last bucket in both paths
    np.testing.assert_array_equal(np.sort(out["y_bin"]), np.sort(oracle.astype("int32")))
    assert out["y_bin"].dtype == np.int32


def test_lambda_and_addition_branches(mixed_ds, mixed_df):
    doubled = ["x"] >> ops.FillMissing(0) >> ops.LambdaOp(lambda s: s * 2) >> ops.Rename(postfix="_2x")
    wf = Workflow(doubled + (["y"] >> ops.FillMissing(0)) + ["id"])
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert set(out.columns) == {"x_2x", "y", "id"}
    np.testing.assert_allclose(
        np.sort(out["x_2x"]), np.sort(mixed_df["x"].fillna(0) * 2), rtol=1e-12
    )


def test_filter_and_dropna(mixed_ds, mixed_df):
    import pyarrow.compute as pc

    wf = Workflow(["x", "id"] >> ops.Filter(lambda t: pc.greater(pc.fill_null(t["x"], -1), 0.0)))
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert len(out) == (mixed_df["x"] > 0).sum()

    wf2 = Workflow(["x", "y"] >> ops.Dropna())
    out2 = wf2.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert len(out2) == mixed_df[["x", "y"]].dropna().shape[0]


def test_hash_ops_deterministic(mixed_ds):
    wf = Workflow(["name_cat"] >> ops.HashBucket(16))
    out1 = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    out2 = wf.transform(mixed_ds).to_pandas()
    assert out1["name_cat"].between(0, 15).all()
    np.testing.assert_array_equal(np.sort(out1["name_cat"]), np.sort(out2["name_cat"]))

    wf3 = Workflow([["name_cat", "id"]] >> ops.HashedCross(10))
    out3 = wf3.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert "name_cat_X_id" in out3.columns
    assert out3["name_cat_X_id"].between(0, 9).all()


def test_reduce_dtype_size(mixed_ds):
    wf = Workflow(["id", "x"] >> ops.ReduceDtypeSize())
    out = wf.fit(mixed_ds).transform(mixed_ds).to_pandas()
    assert out["id"].dtype == np.int8
    assert out["x"].dtype == np.float32
