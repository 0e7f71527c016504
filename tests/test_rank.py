"""GroupRank: per-entity row_number / dense_rank."""

import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops
from nvtabular_ray.selector import ColumnSelector


def _t():
    return pa.table(
        {
            "e": ["a"] * 5 + ["b"] * 3,
            "ts": [10, 10, 20, 30, 30, 5, 5, 6],
            "uid": [1, 2, 3, 4, 5, 6, 7, 8],
        }
    )


def test_row_number_with_tiebreak():
    op = ops.GroupRank("e", ["ts", "uid"], method="row_number")
    out = op.transform(ColumnSelector(["e", "ts", "uid"]), _t())
    assert out.column("row_number").to_pylist() == [1, 2, 3, 4, 5, 1, 2, 3]


def test_dense_rank_ties_share():
    op = ops.GroupRank("e", ["ts"], method="dense_rank")
    out = op.transform(ColumnSelector(["e", "ts"]), _t())
    assert out.column("dense_rank").to_pylist() == [1, 1, 2, 3, 3, 1, 1, 2]


def test_rank_unsorted_scatter_back():
    t = pa.table({"e": ["a"] * 4, "ts": [4, 1, 3, 2], "uid": [1, 2, 3, 4]})
    op = ops.GroupRank("e", ["ts", "uid"])
    out = op.transform(ColumnSelector(["e", "ts", "uid"]), t)
    assert out.column("row_number").to_pylist() == [4, 1, 3, 2]


def test_rank_in_workflow_fused(ray_session):
    ds = rd.from_arrow(_t()).repartition(3)
    wf = Workflow(
        (["ts"] >> ops.GroupRank("e", ["ts", "uid"], out_col="turn_pos"))
        + (["uid"] >> ops.DifferenceLag(partition_cols="e", shift=[1], sort_cols=["ts"]))
        + ["e", "uid"]
    )
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("uid").reset_index(drop=True)
    assert out["turn_pos"].tolist() == [1, 2, 3, 4, 5, 1, 2, 3]


def test_rank_validates():
    with pytest.raises(ValueError):
        ops.GroupRank("e", [], method="row_number")
    with pytest.raises(ValueError):
        ops.GroupRank("e", ["ts"], method="rank")
    op = ops.GroupRank("e", ["ts"])
    out = op.transform(ColumnSelector(["e", "ts"]), _t().slice(0, 0))
    assert out.num_rows == 0 and out.column("row_number").type == pa.int64()


def test_percent_rank_and_ntile():
    t = _t()  # entity a: 5 rows, entity b: 3 rows
    sel = ColumnSelector(["e", "ts", "uid"])
    pr = ops.GroupRank("e", ["ts", "uid"], method="percent_rank").transform(sel, t)
    assert pr.column("percent_rank").to_pylist() == [0.0, 0.25, 0.5, 0.75, 1.0, 0.0, 0.5, 1.0]
    nt = ops.GroupRank("e", ["ts", "uid"], method="ntile", n=2).transform(sel, t)
    # a (5 rows): tiles 3+2 -> 1,1,1,2,2 ; b (3 rows): 2+1 -> 1,1,2
    assert nt.column("ntile").to_pylist() == [1, 1, 1, 2, 2, 1, 1, 2]
    single = pa.table({"e": ["x"], "ts": [1], "uid": [1]})
    pr1 = ops.GroupRank("e", ["ts", "uid"], method="percent_rank").transform(sel, single)
    assert pr1.column("percent_rank").to_pylist() == [0.0]
    nt8 = ops.GroupRank("e", ["ts", "uid"], method="ntile", n=8).transform(sel, _t())
    # more tiles than rows: tile == row_number
    assert nt8.column("ntile").to_pylist() == [1, 2, 3, 4, 5, 1, 2, 3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ops.GroupRank("e", ["ts"], method="ntile")
