"""Chained stat ops, algebraic-vs-bucketed Groupby equivalence, hot-key skew."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=4):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_chained_stat_ops(mixed_df):
    """A stat op downstream of another stat op must fit on TRANSFORMED data
    (reference tests/unit/workflow/test_workflow_chaining.py semantics)."""
    ds = _ds(mixed_df)
    chained = (
        ["name_cat"]
        >> ops.Categorify()
        >> ops.TargetEncoding("label", kfold=1, p_smooth=0, out_col="te", out_dtype="float64")
    )
    wf = Workflow(chained + ["id", "name_cat", "label"])
    out = wf.fit(ds).transform(ds).to_pandas()
    # bijective encoding => TE over codes == TE over raw strings
    oracle = mixed_df["name_cat"].map(mixed_df.groupby("name_cat")["label"].mean())
    m = out.merge(
        mixed_df.assign(te_oracle=oracle)[["name_cat", "te_oracle"]].drop_duplicates(),
        on="name_cat",
    )
    np.testing.assert_allclose(m["te"], m["te_oracle"], rtol=1e-9)


def test_groupby_algebraic_equals_bucketed():
    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {"k": rng.choice(list("abcdef"), 2000), "v": rng.normal(10, 3, 2000)}
    )
    alg = (
        Workflow(["k", "v"] >> ops.Groupby(groupby_cols="k", aggs={"v": ["count", "sum", "mean", "std", "min", "max"]}))
        .fit(_ds(df))
        .transform(_ds(df))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # sort_cols forces the bucketed entity-complete path
    buck = (
        Workflow(
            ["k", "v"]
            >> ops.Groupby(groupby_cols="k", sort_cols=["v"], aggs={"v": ["count", "sum", "mean", "std", "min", "max"]})
        )
        .fit(_ds(df))
        .transform(_ds(df))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for c in ("v_count", "v_sum", "v_mean", "v_std", "v_min", "v_max"):
        np.testing.assert_allclose(alg[c].astype(float), buck[c].astype(float), rtol=1e-4)
    assert alg["v_count"].dtype == np.int32 and alg["v_sum"].dtype == np.float32


def test_hot_key_skew():
    """One entity with 50k rows among 200 tiny ones: algebraic aggregation
    stays partial-first (no entity blowup) and ordered ops stay exact."""
    rng = np.random.RandomState(1)
    hot = pd.DataFrame(
        {"k": "HOT", "t": np.arange(50_000, dtype="int64"), "v": rng.normal(0, 1, 50_000)}
    )
    cold = pd.DataFrame(
        {
            "k": [f"c{i}" for i in range(200) for _ in range(5)],
            "t": list(range(5)) * 200,
            "v": rng.normal(0, 1, 1000),
        }
    )
    df = pd.concat([hot, cold], ignore_index=True).sample(frac=1, random_state=2)
    ds = _ds(df, 8)

    agg = (
        Workflow(["k", "v"] >> ops.Groupby(groupby_cols="k", aggs={"v": ["count", "mean"]}))
        .fit(ds)
        .transform(ds)
        .to_pandas()
        .set_index("k")
    )
    assert int(agg.loc["HOT", "v_count"]) == 50_000
    assert agg.loc["HOT", "v_mean"] == pytest.approx(hot["v"].mean(), rel=1e-4)

    lag = ["v"] >> ops.DifferenceLag(partition_cols="k", shift=[1], sort_cols=["t"])
    out = (
        Workflow(lag + ["k", "t"])
        .fit(ds)
        .transform(ds, num_buckets=8)
        .to_pandas()
        .sort_values(["k", "t"])
    )
    hot_out = out[out["k"] == "HOT"]
    assert len(hot_out) == 50_000
    oracle = hot.sort_values("t")["v"].diff().astype("float32")
    np.testing.assert_allclose(
        hot_out["v_difference_lag_1"].to_numpy(dtype="float64", na_value=np.nan),
        oracle.to_numpy(dtype="float64", na_value=np.nan),
        rtol=1e-4, equal_nan=True,
    )


def test_remove_inputs_and_te_serving(mixed_df=None):
    """remove_inputs strips the label; TargetEncoding then encodes with
    GLOBAL per-category stats (reference serving semantics,
    target_encoding.py:359-368)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    rng = np.random.RandomState(0)
    df = pd.DataFrame(
        {
            "rid": np.arange(600, dtype="int64"),
            "cat": rng.choice(["a", "b", "c"], size=600),
            "y": rng.rand(600),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    te = ops.TargetEncoding("y", kfold=3, fold_on=["rid"], p_smooth=10)
    wf = Workflow((["cat"] >> te) + ["rid"])
    wf.fit(ds)

    serving = wf.remove_inputs(["y"])
    infer_df = df.drop(columns=["y"])
    ids = rd.from_arrow(pa.Table.from_pandas(infer_df, preserve_index=False)).repartition(2)
    out = serving.transform(ids).to_pandas().sort_values("rid").reset_index(drop=True)

    gmean = df["y"].mean()
    stats = df.groupby("cat")["y"].agg(["count", "sum"])
    exp = df["cat"].map(
        (stats["sum"] + 10 * gmean) / (stats["count"] + 10)
    ).to_numpy(dtype="float32")
    np.testing.assert_allclose(out["TE_cat_y"].to_numpy(), exp, rtol=1e-5)

    # training path (target present) still out-of-fold: differs from global
    train_out = wf.transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    assert not np.allclose(train_out["TE_cat_y"].to_numpy(), exp, rtol=1e-6)


def test_remove_inputs_prunes_branches():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    df = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0], "id": [0, 1]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    wf = Workflow((["a"] >> ops.LogOp()) + (["b"] >> ops.LogOp()) + ["id"])
    wf.fit(ds)
    pruned = wf.remove_inputs(["b"])
    out = pruned.transform(ds).to_pandas()
    assert sorted(out.columns) == ["a", "id"]
    import pytest

    with pytest.raises(ValueError):
        wf.remove_inputs(["a", "b", "id"])


def test_fit_schema_properties():
    import pyarrow as pa

    from nvtabular_ray import Workflow, ops

    wf = Workflow((["x"] >> ops.LogOp()) + ["id"])
    wf.fit_schema({"x": pa.float64(), "id": pa.int64(), "unused": pa.string()})
    assert wf.input_schema == {"x": pa.float64(), "id": pa.int64()}
    assert wf.output_dtypes["x"] == pa.float32()
