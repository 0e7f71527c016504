"""Round-3 ADVICE regression pins:

1. search_sorted vocab cache is keyed by the stable group name, so two
   columns with different vocabs can never alias through id() reuse.
2. HLL DataStats keeps null/row counts from all-null batches (sentinel row).
3. DecodeImageStage / FrameSampleStage parse large_binary (int64 offsets)
   correctly instead of misreading them as int32.
4. Workflow.remove_inputs keeps a parent's subgraph alias when an addition
   node collapses onto it.
5. MinHash label propagation preserves the id column dtype exactly (the
   driver's value-hash distinguishes int64 from float64).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df: pd.DataFrame, blocks: int = 2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_search_sorted_cache_keyed_by_group_name():
    # two int columns with DISJOINT vocabs; an id()-keyed cache could serve
    # column a's sorted vocab for column b after wrapper reuse
    df = pd.DataFrame(
        {
            "a": [10, 20, 30, 10, 20] * 40,
            "b": [7, 8, 9, 7, 9] * 40,
            "rid": range(200),
        }
    )
    wf = Workflow((["a", "b"] >> ops.Categorify(search_sorted=True)) + ["rid"])
    out = wf.fit(_ds(df, 4)).transform(_ds(df, 4)).to_pandas().sort_values("rid")
    ref = Workflow((["a", "b"] >> ops.Categorify()) + ["rid"])
    exp = ref.fit(_ds(df, 4)).transform(_ds(df, 4)).to_pandas().sort_values("rid")
    assert (out["a"].to_numpy() == exp["a"].to_numpy()).all()
    assert (out["b"].to_numpy() == exp["b"].to_numpy()).all()
    op = wf._op_nodes()[0].op
    # cache keys are the group names (strings), not object ids
    assert all(isinstance(k, str) for k in op._ss_cache)


def test_hll_all_null_batch_keeps_null_and_row_counts():
    # one block entirely null: its null/row counts must survive the reduce
    df = pd.DataFrame({"v": [None] * 50 + list(range(950))})
    ds = rd.from_pandas(df.iloc[:50]).union(rd.from_pandas(df.iloc[50:]))
    wf = Workflow(["v"] >> ops.DataStats(approx_distinct=True))
    wf.fit(ds)
    st = wf._op_nodes()[0].op.output["v"]
    assert st["per_nan"] == pytest.approx(5.0)  # 50 / 1000
    assert abs(st["cardinality"] - 950) / 950 < 0.05


def test_hll_estimate_ignores_sentinel_register():
    from nvtabular_ray.functions.hashing import hash64
    from nvtabular_ray.functions.hll import hll_estimate, hll_partial

    idx, rho = hll_partial(hash64(pa.array(list(range(1000)))))
    base = hll_estimate(idx, rho)
    with_sentinel = hll_estimate(
        np.concatenate([idx, [-1]]), np.concatenate([rho, [0]])
    )
    assert with_sentinel == base


@pytest.mark.parametrize("bin_type", [pa.binary(), pa.large_binary()])
def test_decode_image_stage_large_binary_offsets(bin_type):
    from nvtabular_ray.multimodal.stages import DecodeImageStage

    payloads = [bytes([i % 256]) * (8 + i) for i in range(6)]
    t = pa.table({"image": pa.array(payloads, bin_type), "rid": list(range(6))})
    out_small = DecodeImageStage(out_dim=4)(
        pa.table({"image": pa.array(payloads, pa.binary()), "rid": list(range(6))})
    )
    out = DecodeImageStage(out_dim=4)(t)
    a = np.asarray(out.column("image_features").to_pylist())
    b = np.asarray(out_small.column("image_features").to_pylist())
    np.testing.assert_allclose(a, b)


@pytest.mark.parametrize("bin_type", [pa.binary(), pa.large_binary()])
def test_frame_sample_stage_large_binary_offsets(bin_type):
    from nvtabular_ray.multimodal.stages import FrameSampleStage

    payloads = [bytes(range(64)), bytes(range(32)), b""]
    t = pa.table({"video": pa.array(payloads, bin_type), "rid": [0, 1, 2]})
    out = FrameSampleStage(frame_bytes=16, every_k=2)(t)
    # row 0: 4 frames -> sampled 0,2 ; row 1: 2 frames -> sampled 0 ; row 2: none
    assert out.column("rid").to_pylist() == [0, 0, 1]
    assert out.column("frame_idx").to_pylist() == [0, 2, 0]
    assert out.column("frame").to_pylist()[0] == bytes(range(16))
    assert out.column("frame").to_pylist()[1] == bytes(range(32, 48))


def test_remove_inputs_keeps_subgraph_alias():
    named = (["x"] >> ops.FillMissing(0.0)).alias("contin")
    other = ["y"] >> ops.FillMissing(0.0)
    wf = Workflow(named + other + ["rid"])
    df = pd.DataFrame({"x": [1.0, None], "y": [2.0, 3.0], "rid": [0, 1]})
    wf.fit(_ds(df, 1))
    pruned = wf.remove_inputs(["y"])
    sub = pruned.get_subworkflow("contin")
    assert sub is not None


def test_minhash_output_dtypes_exact():
    from nvtabular_ray.functions.dedup import minhash_lsh_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "text": (["the quick brown fox jumps over the lazy dog"] * 20
                     + [f"unique document number {i} with words" for i in range(20)]),
        }
    )
    out = minhash_lsh_dedup(_ds(df, 3), text_col="text", id_col="doc_id")
    tab = out.to_pandas()
    assert str(tab["doc_id"].dtype) == "int64"
    assert str(tab["cluster_id"].dtype) == "int64"
    # the 20 identical docs collapse to doc 0
    m = tab.set_index("doc_id")["cluster_id"]
    assert (m.loc[list(range(20))] == 0).all()


def test_distributed_multicol_joingroupby_matches_broadcast():
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "user": rng.randint(0, 7, 300),
            "region": rng.choice(["eu", "us", "ap"], 300),
            "x": rng.normal(size=300),
            "rid": np.arange(300),
        }
    )
    outs = {}
    for dist in (False, True):
        node = [["user", "region"]] >> ops.JoinGroupby(
            cont_cols=["x"], stats=["count", "sum", "mean"], distributed=dist
        )
        wf = Workflow(node + ["rid"])
        outs[dist] = (
            wf.fit(_ds(df, 3)).transform(_ds(df, 3)).to_pandas()
            .sort_values("rid").reset_index(drop=True)
        )
    a, b = outs[False], outs[True]
    assert sorted(a.columns) == sorted(b.columns)
    np.testing.assert_array_equal(a["user_region_count"], b["user_region_count"])
    np.testing.assert_allclose(a["user_region_x_sum"], b["user_region_x_sum"], rtol=1e-12)
    np.testing.assert_allclose(a["user_region_x_mean"], b["user_region_x_mean"], rtol=1e-6)


def test_distributed_multicol_target_encode_matches_broadcast():
    # reference joint multi-column cat group equivalence
    # (/root/reference/tests/unit/ops/test_target_encode.py:142-145)
    rng = np.random.RandomState(6)
    df = pd.DataFrame(
        {
            "cat": rng.choice(list("ABCD"), 400),
            "cat2": rng.choice(list("xy"), 400),
            "y": rng.normal(size=400),
            "rid": np.arange(400),
        }
    )
    outs = {}
    for dist in (False, True):
        node = [["cat", "cat2"]] >> ops.TargetEncoding(
            "y", kfold=3, fold_on=["rid"], p_smooth=10,
            out_col="te", out_dtype="float64", distributed=dist,
        )
        wf = Workflow(node + ["rid"])
        outs[dist] = (
            wf.fit(_ds(df, 3)).transform(_ds(df, 3)).to_pandas()
            .sort_values("rid").reset_index(drop=True)
        )
    np.testing.assert_allclose(outs[False]["te"], outs[True]["te"], rtol=1e-9)


def test_te_joint_group_constant_col_equivalence():
    # TE over [cat, const] must equal TE over [cat] alone — the reference's
    # TE_cat2 == TE_cat_cat2 joint-group identity when the extra column adds
    # no information (test_target_encode.py:142-145)
    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "cat": rng.choice(list("ABC"), 200),
            "const": ["k"] * 200,
            "y": rng.normal(size=200),
            "rid": np.arange(200),
        }
    )
    single = Workflow(
        (["cat"] >> ops.TargetEncoding("y", kfold=1, p_smooth=5, out_col="te", out_dtype="float64"))
        + ["rid"]
    )
    joint = Workflow(
        ([["cat", "const"]] >> ops.TargetEncoding("y", kfold=1, p_smooth=5, out_col="te", out_dtype="float64"))
        + ["rid"]
    )
    a = single.fit(_ds(df, 2)).transform(_ds(df, 2)).to_pandas().sort_values("rid")
    b = joint.fit(_ds(df, 2)).transform(_ds(df, 2)).to_pandas().sort_values("rid")
    np.testing.assert_allclose(a["te"].to_numpy(), b["te"].to_numpy(), rtol=1e-12)


def test_terminal_groupby_serves_in_process():
    # fit on a Dataset; transform_batch with a terminal Groupby must equal
    # the Dataset path (reference LocalExecutor,
    # /root/reference/nvtabular/workflow/workflow.py:250-254)
    rng = np.random.RandomState(8)
    df = pd.DataFrame(
        {
            "user": rng.randint(0, 5, 120),
            "ts": np.arange(120),
            "x": rng.normal(size=120),
            "kind": rng.choice(list("abc"), 120),
        }
    )
    node = ["user", "ts", "x", "kind"] >> ops.Groupby(
        groupby_cols="user", sort_cols="ts",
        aggs={"x": ["sum", "mean"], "kind": ["first", "last", "list"]},
    )
    wf = Workflow(node)
    wf.fit(_ds(df, 3))
    via_ds = wf.transform(_ds(df, 3)).to_pandas().sort_values("user").reset_index(drop=True)
    via_batch = wf.transform_batch(
        pa.Table.from_pandas(df, preserve_index=False)
    ).to_pandas().sort_values("user").reset_index(drop=True)
    assert sorted(via_ds.columns) == sorted(via_batch.columns)
    for c in sorted(via_ds.columns):
        a, b = via_ds[c], via_batch[c]
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-6)
        elif c.endswith("_list"):
            assert [list(x) for x in a] == [list(x) for x in b], c
        else:
            assert list(a) == list(b), c
