"""Round-2 API parity: transform_batch serving path, subgraph extraction,
and checked dtype propagation (output_schema + first-batch validation)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


@pytest.fixture()
def df():
    rng = np.random.RandomState(7)
    n = 300
    return pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c", "d"], n),
            "x": rng.normal(10, 3, n),
            "user": rng.choice(["u1", "u2", "u3"], n),
            "ts": rng.permutation(n).astype("int64"),
            "rid": np.arange(n, dtype="int64"),
        }
    )


def _flagship_node():
    cats = (["cat"] >> ops.Categorify()).alias("cats")
    conts = (["x"] >> ops.LogOp() >> ops.Normalize()).alias("conts")
    return cats, conts


def test_transform_batch_matches_dataset_path(df):
    cats, conts = _flagship_node()
    wf = Workflow(cats + conts + ["rid"])
    ds = _ds(df)
    wf.fit(ds)
    via_ds = wf.transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    via_batch = (
        wf.transform_batch(pa.Table.from_pandas(df, preserve_index=False))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(via_ds, via_batch[via_ds.columns])


def test_transform_batch_accepts_pandas_and_partitioned(df):
    lag = ["x"] >> ops.DifferenceLag(partition_cols="user", shift=[1], sort_cols=["ts"])
    wf = Workflow(lag + ["rid"])
    ds = _ds(df)
    wf.fit(ds)
    via_ds = wf.transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    via_batch = wf.transform_batch(df).to_pandas().sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_ds, via_batch[via_ds.columns])


def test_transform_batch_unfitted_raises(df):
    wf = Workflow((["cat"] >> ops.Categorify()) + ["rid"])
    with pytest.raises(RuntimeError, match="not fitted"):
        wf.transform_batch(df)


def test_get_subworkflow(df):
    cats, conts = _flagship_node()
    wf = Workflow(cats + conts + ["rid"])
    ds = _ds(df)
    wf.fit(ds)
    sub = wf.get_subworkflow("cats")
    out = sub.transform(ds).to_pandas()
    assert list(out.columns) == ["cat"]
    full = wf.transform(ds).to_pandas()
    assert sorted(out["cat"].unique()) == sorted(full["cat"].unique())
    with pytest.raises(KeyError, match="no subgraph"):
        wf.get_subworkflow("nope")


def test_output_schema_propagation(df):
    cats, conts = _flagship_node()
    te = ["cat"] >> ops.TargetEncoding("x", kfold=1, out_col="te_cat")
    wf = Workflow(cats + conts + te + ["rid"])
    schema = wf.output_schema(
        {"cat": pa.string(), "x": pa.float64(), "rid": pa.int64()}
    )
    assert schema["cat"] == pa.int64()        # Categorify codes
    assert schema["x"] == pa.float64()        # Normalize default out_dtype
    assert schema["te_cat"] == pa.float32()   # TE default out_dtype
    assert schema["rid"] == pa.int64()        # passthrough


def test_schema_mismatch_raises(df):
    class LyingOp(ops.LogOp):
        def output_dtype(self):
            return pa.int32()  # transform actually emits float32

    wf = Workflow((["x"] >> LyingOp()) + ["rid"])
    ds = _ds(df)
    with pytest.raises(Exception, match="schema mismatch"):
        wf.fit(ds).transform(ds).materialize()


def test_list_column_schema(df):
    emb = pd.DataFrame(
        {
            "k": ["a", "b", "a", "c"],
            "tags": [["x", "y"], ["y"], ["x"], ["z", "x"]],
            "rid": np.arange(4, dtype="int64"),
        }
    )
    wf = Workflow((["tags"] >> ops.Categorify()) + ["rid"])
    schema = wf.output_schema({"tags": pa.list_(pa.string()), "rid": pa.int64()})
    assert schema["tags"] == pa.list_(pa.int64())
    ds = _ds(emb, 1)
    out = wf.fit(ds).transform(ds)
    assert out.count() == 4  # validation passes on the real run


def test_transform_dispatches_on_dataframe():
    """workflow.transform(df) == in-process path, same values as Dataset path
    (reference workflow.py:77-122 singledispatch)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    df = pd.DataFrame({"x": [1.0, 2.0, 3.0], "c": ["a", "b", "a"], "id": [0, 1, 2]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    wf = Workflow((["c"] >> ops.Categorify()) + (["x"] >> ops.LogOp()) + ["id"])
    wf.fit(ds)
    via_df = wf.transform(df).sort_values("id").reset_index(drop=True)
    via_ds = wf.transform(ds).to_pandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_df[sorted(via_df.columns)], via_ds[sorted(via_ds.columns)])
    via_tab = wf.transform(pa.Table.from_pandas(df, preserve_index=False))
    assert isinstance(via_tab, pa.Table)


def test_serving_context_and_rank_unsorted_batch(ray_session):
    """In-process transform of an UNSORTED request batch through the
    r4 ordered ops (context assembly + turn position)."""
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    t = pa.table({"e": ["b", "a", "a", "b", "a"], "i": [1, 2, 1, 0, 3],
                  "txt": ["q", "y", "x", "p", "z"]})
    wf = Workflow(
        (["txt"] >> ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=2, sep="|"))
        + (["i"] >> ops.GroupRank("e", ["i"], out_col="pos"))
        + ["e", "i"]
    )
    wf.fit(rd.from_arrow(t))
    out = wf.transform(t).to_pandas().sort_values(["e", "i"]).reset_index(drop=True)
    assert out["txt_ctx2"].tolist() == [None, "x", "x|y", None, "p"]
    assert out["pos"].tolist() == [1, 2, 3, 1, 2]
