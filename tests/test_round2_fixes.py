"""Round-2 regression tests for the advisor-flagged correctness bugs:

1. TargetEncoding fold assignment must never be a function of the target
   (leakage); kfold>1 now REQUIRES an explicit row-unique fold_on.
2. Distributed-state ops chained after a value-modifying op must raise
   (their shuffle join resolves raw root values, diverging from fit).
3. rolling_aggregate: NaN values must not poison later windows (skipna).
4. Categorify: an all-null batch must still contribute its null count.
5. Resume manifest: refit with different CONTENT (same shape) invalidates.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


# ------------------------------------------------------------- 1: TE folds --
def test_te_kfold_requires_fold_on():
    with pytest.raises(ValueError, match="fold_on"):
        ops.TargetEncoding("label", kfold=3)


def test_te_fold_on_rejects_target():
    with pytest.raises(ValueError, match="target"):
        ops.TargetEncoding("label", kfold=3, fold_on=["label"])


def test_te_no_target_leakage():
    """With a binary target and p_smooth=0, out-of-fold TE must NOT reproduce
    the target (the old (category,target) fold hash made TE == target)."""
    rng = np.random.RandomState(0)
    n = 600
    df = pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c"], n),
            "label": rng.randint(0, 2, n).astype("int64"),
            "rid": np.arange(n, dtype="int64"),
        }
    )
    node = ["cat"] >> ops.TargetEncoding(
        "label", kfold=3, p_smooth=0, fold_on=["rid"], out_col="te", out_dtype="float64"
    )
    wf = Workflow(node + ["rid", "cat", "label"])
    out = wf.fit(_ds(df)).transform(_ds(df)).to_pandas().sort_values("rid")
    # TE must be a per-(category,fold) mean of OTHER folds — not 0/1 copies
    assert not np.allclose(out["te"], out["label"])
    corr = np.corrcoef(out["te"], out["label"])[0, 1]
    assert abs(corr) < 0.5, f"TE suspiciously target-correlated: corr={corr}"
    # and it must match the leave-one-fold-out oracle computed in pandas
    from nvtabular_ray.functions.hashing import hash64_columns_stable

    fold = hash64_columns_stable(pa.Table.from_pandas(df[["rid"]]), ["rid"])
    fold = (fold ^ np.uint64(42 * 0x9E3779B97F4A7C15 % (1 << 64))) % np.uint64(3)
    df2 = df.assign(fold=fold.astype("int64"))
    stats = df2.groupby(["cat", "fold"])["label"].agg(["count", "sum"]).reset_index()
    allstats = df2.groupby("cat")["label"].agg(["count", "sum"]).reset_index()
    m = df2.merge(allstats, on="cat").merge(stats, on=["cat", "fold"], suffixes=("_all", "_f"))
    m = m.sort_values("rid")
    te = (m["sum_all"] - m["sum_f"]) / (m["count_all"] - m["count_f"])
    np.testing.assert_allclose(out["te"].to_numpy(), te.to_numpy(), rtol=1e-9)


# ------------------------------------- 2: distributed ops need root inputs --
def test_distributed_after_lambda_raises():
    df = pd.DataFrame(
        {"k": ["x", "y", "z", "x", "y"] * 20, "rid": np.arange(100, dtype="int64")}
    )
    node = (
        ["k"]
        >> ops.LambdaOp(lambda s: s.str.upper(), backend="pandas")
        >> ops.Categorify(distributed=True)
    )
    wf = Workflow(node + ["rid"])
    ds = _ds(df)
    with pytest.raises(NotImplementedError, match="root"):
        wf.fit(ds).transform(ds)


def test_distributed_direct_root_still_works():
    df = pd.DataFrame(
        {"k": ["x", "y", "z", "x", "y"] * 20, "rid": np.arange(100, dtype="int64")}
    )
    node = ["k"] >> ops.Categorify(distributed=True)
    wf = Workflow(node + ["rid"])
    ds = _ds(df)
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("rid")
    # x (40) -> 3, y (40) -> 4, z (20) -> 5
    codes = dict(zip(df["k"], out["k"]))
    assert codes == {"x": 3, "y": 4, "z": 5}


# --------------------------------------------------- 3: rolling NaN poison --
def test_rolling_aggregate_skipna():
    from nvtabular_ray.functions.grouped_np import rolling_aggregate

    values = np.array([1.0, np.nan, 2.0, 3.0, 4.0])
    ts = np.array([0, 10, 20, 30, 40], dtype=np.int64)
    gid = np.zeros(5, dtype=np.int64)
    out = rolling_aggregate(values, ts, gid, window_us=10**9, aggs=["count", "sum", "mean", "min", "max"])
    np.testing.assert_array_equal(out["count"], [1, 1, 2, 3, 4])
    np.testing.assert_allclose(out["sum"], [1, 1, 3, 6, 10])
    np.testing.assert_allclose(out["mean"], [1, 1, 1.5, 2, 2.5])
    np.testing.assert_allclose(out["min"], [1, 1, 1, 1, 1])
    np.testing.assert_allclose(out["max"], [1, 1, 2, 3, 4])


def test_rolling_aggregate_all_nan_window():
    from nvtabular_ray.functions.grouped_np import rolling_aggregate

    values = np.array([np.nan, np.nan, 5.0])
    ts = np.array([0, 1, 2], dtype=np.int64)
    gid = np.zeros(3, dtype=np.int64)
    out = rolling_aggregate(values, ts, gid, window_us=10, aggs=["count", "sum", "mean", "min"])
    np.testing.assert_array_equal(out["count"], [0, 0, 1])
    assert np.isnan(out["sum"][0]) and np.isnan(out["mean"][1]) and np.isnan(out["min"][0])
    np.testing.assert_allclose(out["sum"][2], 5.0)


# ----------------------------------------------- 4: all-null batch nulls --
@pytest.mark.parametrize("dtype", ["string", "float"])
def test_categorify_all_null_batch_null_count(dtype):
    if dtype == "string":
        vals = pa.array([None, None, None], pa.string())
        vals2 = pa.array(["a", "a", "b"], pa.string())
    else:
        vals = pa.array([None, None, None], pa.float64())
        vals2 = pa.array([1.0, 1.0, 2.0], pa.float64())
    t_null = pa.table({"c": vals})
    t_vals = pa.table({"c": vals2})
    # two blocks: one entirely null, one with values
    ds = rd.from_arrow([t_null, t_vals])
    op = ops.Categorify()
    wf = Workflow(["c"] >> op)
    wf.fit(ds)
    name = "c"
    assert op.null_counts[name] == 3
    # the sentinel must NOT have entered the vocab
    vocab = op.vocab_tables[name]
    assert vocab.num_rows == 2
    assert vocab.column("c").null_count == 0


# ------------------------------------------------- 5: resume content hash --
def test_resume_hash_tracks_table_content():
    from nvtabular_ray.state.resume import _op_chain_hash

    df1 = pd.DataFrame({"k": ["a", "a", "b"], "rid": [0, 1, 2]})
    df2 = pd.DataFrame({"k": ["c", "c", "d"], "rid": [0, 1, 2]})  # same shape, new values
    h = []
    for df in (df1, df2):
        op = ops.Categorify()
        wf = Workflow((["k"] >> op) + ["rid"])
        wf.fit(_ds(df, blocks=1))
        h.append(_op_chain_hash(wf))
    assert h[0] != h[1], "same-cardinality refit must change the op-chain hash"


# ----------------------------------------------- LambdaOp auto backend --
def test_lambdaop_auto_backend_arrow_and_pandas():
    import pyarrow.compute as pc

    df = pd.DataFrame({"x": np.arange(10, dtype="float64"), "rid": np.arange(10, dtype="int64")})
    # arrow-friendly fn: stays on the zero-copy path
    op_arrow = ops.LambdaOp(lambda a: pc.add(a, 1.0))
    wf = Workflow((["x"] >> op_arrow) + ["rid"])
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas().sort_values("rid")
    np.testing.assert_allclose(out["x"], df["x"] + 1.0)
    # pandas-only fn (Series operator): auto falls back, result correct
    op_pd = ops.LambdaOp(lambda s: s * 2.0)
    wf2 = Workflow((["x"] >> op_pd) + ["rid"])
    out2 = wf2.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas().sort_values("rid")
    np.testing.assert_allclose(out2["x"], df["x"] * 2.0)
    # probe verdict is cached on the op after local (serving-path) use
    op3 = ops.LambdaOp(lambda s: s * 2.0)
    wf3 = Workflow((["x"] >> op3) + ["rid"])
    wf3.fit(_ds(df, 1))
    wf3.transform_batch(df)
    assert op3._resolved_backend == "pandas"
