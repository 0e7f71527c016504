"""Categorify golden tests, mirroring the reference's exact-code fixtures
(/root/reference/tests/unit/ops/test_categorify.py:128-200 and FIXTURES.md F3).

Encoding convention: 0=pad (unused), 1=null, [2, 2+num_oov)=OOV, vocabulary
most-frequent-first with (count desc, value asc) tie-break.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_list_column_exact_codes():
    # reference test_categorify.py:128-157: multi-hot authors
    df = pd.DataFrame(
        {
            "Authors": [["User_A"], ["User_A", "User_E"], ["User_B", "User_C"], ["User_C"]],
            "Engaging_User": ["User_B", "User_B", "User_A", "User_D"],
            "Post": [1, 2, 3, 4],
        }
    )
    wf = Workflow((["Authors", "Engaging_User"] >> ops.Categorify()) + ["Post"])
    out = (
        wf.fit(_ds(df, 1))
        .transform(_ds(df, 1))
        .to_pandas()
        .sort_values("Post")
        .reset_index(drop=True)
    )
    # vocab sorted by (count desc, value asc); base = 2 + 1 OOV = 3
    # Authors counts: User_A:2, User_C:2, User_B:1, User_E:1
    # => User_A->3, User_C->4, User_B->5, User_E->6
    assert [list(x) for x in out["Authors"]] == [[3], [3, 6], [5, 4], [4]]
    # Engaging_User counts: User_B:2, User_A:1, User_D:1 => B->3, A->4, D->5
    assert list(out["Engaging_User"]) == [3, 3, 4, 5]


def test_null_handling_and_oov():
    df = pd.DataFrame({"brand": ["a", "a", "b", None, None, "c"]})
    new = pd.DataFrame({"brand": ["a", "zzz", None, "b"]})
    wf = Workflow(["brand"] >> ops.Categorify())
    wf.fit(_ds(df))
    out = wf.transform(_ds(new, 1)).to_pandas()
    # vocab: a(2) -> 3, b(1) -> 4, c(1) -> 5 ; OOV -> 2 ; null -> 1
    assert list(out["brand"]) == [3, 2, 1, 4]


def test_freq_threshold_and_max_size():
    df = pd.DataFrame({"c": ["a"] * 5 + ["b"] * 3 + ["x"] * 1 + ["y"] * 1})
    wf = Workflow(["c"] >> ops.Categorify(freq_threshold=2))
    out = wf.fit(_ds(df)).transform(_ds(df, 1)).to_pandas()
    # only a,b in vocab; x,y -> OOV(2)
    assert list(out["c"]) == [3] * 5 + [4] * 3 + [2, 2]

    wf2 = Workflow(["c"] >> ops.Categorify(max_size=4))
    out2 = wf2.fit(_ds(df)).transform(_ds(df, 1)).to_pandas()
    # max_size=4 => keep 4-2-1=1 vocab entries => only 'a'
    assert list(out2["c"]) == [3] * 5 + [2] * 5


def test_num_buckets_oov_hashing():
    df = pd.DataFrame({"c": ["a", "a", "b"]})
    new = pd.DataFrame({"c": ["a", "b", "q", "r", "s", None]})
    wf = Workflow(["c"] >> ops.Categorify(num_buckets=4, freq_threshold=2))
    wf.fit(_ds(df, 1))
    out = wf.transform(_ds(new, 1)).to_pandas()
    codes = list(out["c"])
    assert codes[0] == 6  # vocab base = 2 + 4
    assert all(2 <= c < 6 for c in codes[1:5])  # b fell below threshold -> OOV
    assert codes[5] == 1
    # determinism
    out2 = wf.transform(_ds(new, 1)).to_pandas()
    assert list(out2["c"]) == codes


def test_joint_encoding_shared_vocab():
    # reference test_categorify.py:160-200 joint semantics
    df = pd.DataFrame(
        {
            "Author": ["User_A", "User_E", "User_B", "User_C"],
            "Engaging_User": ["User_B", "User_B", "User_A", "User_D"],
        }
    )
    wf = Workflow([["Author", "Engaging_User"]] >> ops.Categorify(encode_type="joint"))
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas()
    # combined counts: A:2, B:3, C:1, D:1, E:1 -> B->3, A->4, C->5, D->6, E->7
    assert list(out["Author"]) == [4, 7, 3, 5]
    assert list(out["Engaging_User"]) == [3, 3, 4, 6]


def test_combo_encoding():
    df = pd.DataFrame(
        {
            "Author": ["User_A", "User_E", "User_B", "User_C"],
            "Engaging_User": ["User_B", "User_B", "User_A", "User_D"],
        }
    )
    wf = Workflow([["Author", "Engaging_User"]] >> ops.Categorify(encode_type="combo"))
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas()
    assert list(out.columns) == ["Author_Engaging_User"]
    # 4 distinct pairs, each count 1, sorted by value asc:
    # (A,B)->3, (B,A)->4, (C,D)->5, (E,B)->6
    assert list(out["Author_Engaging_User"]) == [3, 6, 4, 5]


def test_partition_count_invariance():
    rng = np.random.RandomState(7)
    df = pd.DataFrame({"c": rng.choice(list("abcdefgh"), 500), "i": np.arange(500)})
    outs = []
    for blocks in (1, 3, 8):
        wf = Workflow((["c"] >> ops.Categorify()) + ["i"])
        out = (
            wf.fit(_ds(df, blocks))
            .transform(_ds(df, blocks))
            .to_pandas()
            .sort_values("i")
            .reset_index(drop=True)
        )
        outs.append(list(out["c"]))
    assert outs[0] == outs[1] == outs[2]


def test_user_vocab_and_embedding_sizes(tmp_path):
    df = pd.DataFrame({"c": ["a", "b", "z"]})
    wf = Workflow(["c"] >> ops.Categorify(vocabs={"c": ["b", "a"]}, out_path=str(tmp_path)))
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas()
    assert list(out["c"]) == [4, 3, 2]  # b->3, a->4, z OOV->2

    sizes = ops.get_embedding_sizes(wf)
    card, dim = sizes["c"]
    assert card == 3 + 2  # base(3) + 2 vocab entries
    assert dim == min(max(16, round(1.6 * card**0.56)), 512)


def test_artifacts_written(tmp_path):
    import pyarrow.parquet as pq

    df = pd.DataFrame({"c": ["a", "a", None, "b"]})
    wf = Workflow(["c"] >> ops.Categorify(out_path=str(tmp_path)))
    wf.fit(_ds(df, 1))
    uniques = pq.read_table(tmp_path / "unique.c.parquet")
    assert uniques.column("c").to_pylist() == ["a", "b"]
    meta = pq.read_table(tmp_path / "meta.c.parquet").to_pylist()[0]
    assert meta["nulls"] == 1 and meta["num_observed"] == 2


def test_dtype_override(mixed_ds):
    import pyarrow as pa

    wf = Workflow((["name_cat"] >> ops.Categorify(dtype="int32")) + ["id"])
    out = wf.fit(mixed_ds).transform(mixed_ds)
    schema = out.schema()
    assert dict(zip(schema.names, schema.types))["name_cat"] == pa.int32()


def test_joint_scalar_and_list_column():
    """Shared vocab spans a scalar col and a multi-hot list col (reference
    tests/unit/ops/test_categorify.py test_categorify_joint_list)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    t = pa.table(
        {
            "a": pa.array(["x", "y", "x", "z"]),
            "b": pa.array([["x", "w"], ["y"], [], ["w", "w", "z"]], pa.list_(pa.string())),
            "id": pa.array([0, 1, 2, 3], pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    wf = Workflow(([["a", "b"]] >> ops.Categorify(encode_type="joint")) + ["id"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("id").reset_index(drop=True)
    # counts: w=2 x=2 (tie -> value asc), y=1 z=1 -> codes w=3 x=4 y=5 z=6
    assert list(out["a"]) == [4, 5, 4, 6]
    assert [list(v) for v in out["b"]] == [[4, 3], [5], [], [3, 3, 6]]
