"""Distributed (larger-than-driver-memory) Categorify: the SURVEY.md §7.4.5
scale path — vocab stays a Ray Dataset end-to-end (groupby shuffle ->
distributed rank sort -> sharded parquet), encode is a shuffle join.
Reference analog: split_out>1, /root/reference/nvtabular/ops/categorify.py:1644-1679.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _events(n=500, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.zipf(1.5, n).astype("int64") % 40,
            "kind": rng.choice(["a", "b", "c", "d", None], n, p=[0.4, 0.3, 0.2, 0.05, 0.05]),
            "ts": np.arange(n, dtype="int64"),
            "value": rng.normal(size=n),
        }
    )


def _arrow_ds(df, parts=4):
    import pyarrow as pa

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)


def _both(df, node_mem, node_dist):
    ds = _arrow_ds(df)
    a = Workflow(node_mem + ["event_id"]).fit(ds).transform(ds)
    b = Workflow(node_dist + ["event_id"]).fit(ds).transform(ds)
    a = a.to_pandas().sort_values("event_id").reset_index(drop=True)
    b = b.to_pandas().sort_values("event_id").reset_index(drop=True)
    return a, b


def test_distributed_matches_in_memory():
    df = _events()
    a, b = _both(
        df,
        ["user_id", "kind"] >> ops.Categorify(),
        ["user_id", "kind"] >> ops.Categorify(distributed=True),
    )
    assert list(a.columns) == list(b.columns)
    for c in ("user_id", "kind"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all()
    # nulls encode to 1 in both
    nulls = df["kind"].isna().to_numpy()
    assert (b.sort_index()["kind"].to_numpy()[nulls] == 1).all()


def test_distributed_freq_threshold_and_oov_buckets():
    df = _events()
    a, b = _both(
        df,
        ["user_id"] >> ops.Categorify(freq_threshold=10, num_buckets=4),
        ["user_id"] >> ops.Categorify(freq_threshold=10, num_buckets=4, distributed=True),
    )
    assert (a["user_id"].to_numpy() == b["user_id"].to_numpy()).all()
    # OOV range actually used
    assert ((b["user_id"] >= 2) & (b["user_id"] <= 5)).any()


def test_distributed_joint_shared_vocab():
    df = _events()
    df["kind2"] = df["kind"].map({"a": "b", "b": "c", "c": "d", "d": "a"})
    a, b = _both(
        df,
        [["kind", "kind2"]] >> ops.Categorify(),
        [["kind", "kind2"]] >> ops.Categorify(distributed=True),
    )
    for c in ("kind", "kind2"):
        assert (a[c].to_numpy() == b[c].to_numpy()).all()


def test_distributed_chained_with_partitioned_op():
    """Distributed codes must survive the bucketed conv-shuffle path and the
    synthetic __catcode_* columns must not leak into the output."""
    df = _events()
    ds = _arrow_ds(df)
    node = (["kind"] >> ops.Categorify(distributed=True)) + (
        ["value"] >> ops.DifferenceLag(partition_cols="user_id", shift=[1], sort_cols=["ts"])
    )
    wf = Workflow(node + ["event_id", "user_id"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert not any(c.startswith("__catcode_") for c in out.columns)
    ref = (
        Workflow((["kind"] >> ops.Categorify()) + ["event_id"])
        .fit(ds)
        .transform(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert (out["kind"].to_numpy() == ref["kind"].to_numpy()).all()
    # lag column present and entity-masked like the plain op
    first_per_user = ~df.sort_values("ts").duplicated("user_id", keep="first").to_numpy()
    assert out["value_difference_lag_1"].isna().sum() >= first_per_user.sum()


def test_distributed_embedding_sizes_and_max_size():
    from nvtabular_ray.ops.categorify import get_embedding_sizes

    df = _events()
    ds = _arrow_ds(df)
    wf = Workflow((["user_id"] >> ops.Categorify(max_size=10, distributed=True)) + ["event_id"])
    wf.fit(ds)
    card, dim = get_embedding_sizes(wf)["user_id"]
    assert card == 10  # max_size caps base(3) + vocab rows
    out = wf.transform(ds).to_pandas()
    assert out["user_id"].max() <= 9


def test_distributed_save_load_roundtrip(tmp_path):
    """distributed_vocabs is path-referenced state (reference model:
    vocab parquet on shared FS, categorify.py:404-408) — survives save/load."""
    df = _events()
    ds = _arrow_ds(df)
    wf = Workflow(
        (["kind"] >> ops.Categorify(out_path=str(tmp_path / "cats"), distributed=True))
        + ["event_id"]
    )
    wf.fit(ds)
    wf.save(str(tmp_path / "wf"))
    from nvtabular_ray.workflow import Workflow as W

    wf2 = W.load(str(tmp_path / "wf"))
    a = wf.transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    b = wf2.transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert (a["kind"].to_numpy() == b["kind"].to_numpy()).all()


def test_distributed_combo_matches_broadcast():
    """combo + distributed=True is supported since round 4 (tuple vocab via
    the injective-composite exchange); full coverage lives in
    tests/test_categorify_combo_distributed.py — this pins the basic
    equivalence on the shared fixture."""
    df = _events()
    ds = _arrow_ds(df)
    wf_d = Workflow(
        ([["user_id", "kind"]] >> ops.Categorify(encode_type="combo", distributed=True))
        + ["event_id"]
    )
    wf_b = Workflow(
        ([["user_id", "kind"]] >> ops.Categorify(encode_type="combo")) + ["event_id"]
    )
    out_d = wf_d.fit(ds).transform(ds).to_pandas().sort_values("event_id")
    out_b = wf_b.fit(ds).transform(ds).to_pandas().sort_values("event_id")
    np.testing.assert_array_equal(
        out_d["user_id_kind"].to_numpy(), out_b["user_id_kind"].to_numpy()
    )


def test_distributed_join_groupby_matches_broadcast():
    """JoinGroupby(distributed=True): stat table stays a Dataset, joined
    back by a bucketed shuffle — values identical to the broadcast path."""
    df = _events()
    ds = _arrow_ds(df)

    def run(distributed):
        node = ["user_id"] >> ops.JoinGroupby(
            cont_cols=["value"],
            stats=["count", "sum", "mean", "std"],
            distributed=distributed,
        )
        wf = Workflow(node + ["event_id"])
        return (
            wf.fit(ds).transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a, b = run(False), run(True)
    assert sorted(a.columns) == sorted(b.columns)
    for c in a.columns:
        if a[c].dtype.kind == "f":
            np.testing.assert_allclose(a[c], b[c], rtol=1e-9)
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c
    assert str(b["user_id_count"].dtype) == "int32"


def test_distributed_target_encoding_matches_broadcast():
    """TargetEncoding(distributed=True): per-(category,fold) stats stay a
    Dataset; one bucketed shuffle resolves both fold and total stats —
    TE values identical to the broadcast path."""
    df = _events()
    ds = _arrow_ds(df)

    def run(distributed):
        node = ["user_id"] >> ops.TargetEncoding(
            "value", kfold=3, fold_on=["event_id"], distributed=distributed
        )
        wf = Workflow(node + ["event_id"])
        return (
            wf.fit(ds).transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a, b = run(False), run(True)
    assert sorted(a.columns) == sorted(b.columns)
    np.testing.assert_allclose(a["TE_user_id_value"], b["TE_user_id_value"], rtol=1e-6)

    # kfold=1 (transform-only global stats) path
    def run1(distributed):
        node = ["user_id"] >> ops.TargetEncoding("value", kfold=1, distributed=distributed)
        wf = Workflow(node + ["event_id"])
        return (
            wf.fit(ds).transform(ds).to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a1, b1 = run1(False), run1(True)
    np.testing.assert_allclose(a1["TE_user_id_value"], b1["TE_user_id_value"], rtol=1e-6)


def test_distributed_list_column_exact_codes():
    # reference exact list codes fixture
    # (/root/reference/tests/unit/ops/test_categorify.py:154-157):
    # vocab (count desc, value asc): User_A=3, User_C=4, User_B=5, User_E=6
    import pyarrow as pa

    tab = pa.table(
        {
            "Authors": pa.array(
                [["User_A"], ["User_A", "User_E"], ["User_B", "User_C"], ["User_C"]],
                pa.list_(pa.string()),
            ),
            "Post": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    ds = rd.from_arrow(tab).repartition(2)
    wf = Workflow((["Authors"] >> ops.Categorify(distributed=True)) + ["Post"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("Post")
    got = [list(x) for x in out["Authors"]]
    assert got == [[3], [3, 6], [5, 4], [4]]


def test_distributed_list_column_matches_in_memory():
    rng = np.random.RandomState(11)
    n = 400
    words = np.array([f"w{i}" for i in range(30)])
    lists = [list(words[rng.randint(0, 30, rng.randint(0, 6))]) for _ in range(n)]
    import pyarrow as pa

    tab = pa.table(
        {
            "tokens": pa.array(lists, pa.list_(pa.string())),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(tab).repartition(4)
    a = (
        Workflow((["tokens"] >> ops.Categorify()) + ["event_id"])
        .fit(ds).transform(ds).to_pandas().sort_values("event_id")
    )
    b = (
        Workflow((["tokens"] >> ops.Categorify(distributed=True)) + ["event_id"])
        .fit(ds).transform(ds).to_pandas().sort_values("event_id")
    )
    ga = [list(x) for x in a["tokens"]]
    gb = [list(x) for x in b["tokens"]]
    assert ga == gb


def test_distributed_mixed_scalar_and_list_single_assembly():
    """Scalar + list columns in ONE distributed Categorify: the unified
    join_encode plan attaches BOTH columns' codes in a single full-row
    reassembly exchange; codes must match the in-memory path exactly."""
    import pyarrow as pa

    rng = np.random.RandomState(7)
    n = 500
    words = np.array([f"w{i}" for i in range(25)])
    tab = pa.table(
        {
            "tags": pa.array(
                [list(words[rng.randint(0, 25, rng.randint(0, 5))]) for _ in range(n)],
                pa.list_(pa.string()),
            ),
            "kind": pa.array([f"k{i}" for i in rng.randint(0, 12, n)]),
            "rid": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)
    dist = Workflow((["tags", "kind"] >> ops.Categorify(distributed=True, split_out=3)) + ["rid"])
    mem = Workflow((["tags", "kind"] >> ops.Categorify()) + ["rid"])
    a = dist.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    b = mem.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    assert a["kind"].tolist() == b["kind"].tolist()
    assert [list(x) for x in a["tags"]] == [list(x) for x in b["tags"]]


def test_distributed_list_column_null_rows_stay_null():
    """ADVICE r3: a NULL list row must reassemble as a NULL list (broadcast
    parity), not an empty list — including the legal Arrow layout where the
    null row's offsets span nonzero child values (flatten() skips them, so
    the expand stage must zero that row's length or uid/value pairing
    desyncs for the rest of the batch)."""
    import pyarrow as pa

    # null row WITH a nonzero offset span: build buffers by hand
    values = pa.array(["a", "b", "ghost", "c", "d"], pa.string())
    offsets = pa.array([0, 2, 3, 5], pa.int32())  # row1 spans ["ghost"]
    validity = pa.array([True, False, True])
    lst = pa.Array.from_buffers(
        pa.list_(pa.string()),
        3,
        [validity.buffers()[1], offsets.buffers()[1]],
        children=[values],
    )
    assert lst.null_count == 1 and not lst[1].is_valid
    tab = pa.table(
        {
            "tokens": lst,
            "rid": pa.array([0, 1, 2], pa.int64()),
        }
    )
    ds = rd.from_arrow(tab).repartition(2)

    def rows(wf):
        import ray

        out = wf.fit(ds).transform(ds)
        t = pa.concat_tables(
            [x for x in ray.get(out.to_arrow_refs()) if x.num_rows],
            promote_options="default",
        )
        d = {r: v for r, v in zip(t.column("rid").to_pylist(), t.column("tokens").to_pylist())}
        return [d[r] for r in sorted(d)]

    a = rows(Workflow((["tokens"] >> ops.Categorify()) + ["rid"]))
    b = rows(Workflow((["tokens"] >> ops.Categorify(distributed=True)) + ["rid"]))
    # row 1 is NULL on both paths (not []); rows 0/2 carry the same codes
    assert a[1] is None and b[1] is None
    assert a == b and a[0] and a[2]
