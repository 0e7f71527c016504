"""Round-2 Categorify options: search_sorted, single_table, cat_cache='disk'
(reference categorify.py:180,219,169-173) and data_gen multi-hot/vocab-file."""

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
    rng = np.random.RandomState(13)
    n = 400
    return pd.DataFrame(
        {
            "s": rng.choice(["a", "b", "c", "d", "e"], n),
            "i": rng.randint(0, 50, n).astype("int64"),
            "rid": np.arange(n, dtype="int64"),
        }
    )


def test_search_sorted_matches_index_in(df):
    df.loc[5, "s"] = None
    ds = _ds(df)
    base = Workflow((["s", "i"] >> ops.Categorify()) + ["rid"])
    ss = Workflow((["s", "i"] >> ops.Categorify(search_sorted=True)) + ["rid"])
    a = base.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    b = ss.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_search_sorted_oov(df):
    ds = _ds(df)
    wf = Workflow((["s"] >> ops.Categorify(search_sorted=True)) + ["rid"])
    wf.fit(ds)
    served = wf.transform_batch(pa.table({"s": ["a", "zzz", None], "rid": [0, 1, 2]}))
    codes = served.column("s").to_pylist()
    assert codes[1] == 2  # OOV
    assert codes[2] == 1  # null


def test_search_sorted_rejects_freq_threshold():
    with pytest.raises(ValueError, match="search_sorted"):
        ops.Categorify(search_sorted=True, freq_threshold=5)


def test_single_table_disjoint_ranges(df):
    ds = _ds(df)
    wf = Workflow((["s", "i"] >> ops.Categorify(single_table=True)) + ["rid"])
    out = wf.fit(ds).transform(ds).to_pandas()
    s_max = out["s"].max()
    i_min = out["i"].min()
    # column ranges must not overlap: i's window starts after s's
    assert i_min > s_max
    # and relative order inside each column is unchanged vs the plain encode
    plain = (
        Workflow((["s", "i"] >> ops.Categorify()) + ["rid"])
        .fit(ds)
        .transform(ds)
        .to_pandas()
    )
    off = out["i"].min() - plain["i"].min()
    assert (out["i"] - plain["i"] == off).all()
    assert (out["s"] == plain["s"]).all()  # first column unshifted


def test_single_table_distributed_matches_broadcast(df):
    """single_table works on the distributed path: offsets come from the
    driver-small per-group cardinality metadata, not the vocab rows."""
    ds = _ds(df)
    out_b = (
        Workflow((["s", "i"] >> ops.Categorify(single_table=True)) + ["rid"])
        .fit(ds)
        .transform(ds)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    out_d = (
        Workflow(
            (["s", "i"] >> ops.Categorify(single_table=True, distributed=True, split_out=4))
            + ["rid"]
        )
        .fit(ds)
        .transform(ds)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    for c in ["s", "i"]:
        np.testing.assert_array_equal(out_b[c].to_numpy(), out_d[c].to_numpy())


def test_cat_cache_disk(df, tmp_path):
    import nvtabular_ray.ops.categorify as C

    ds = _ds(df)
    op = ops.Categorify(cat_cache="disk", out_path=str(tmp_path))
    op._BROADCAST_BYTES = 0  # force the disk tier even for a tiny vocab
    C._BROADCAST_BYTES_SAVE = C._BROADCAST_BYTES
    C._BROADCAST_BYTES = 0
    try:
        wf = Workflow((["s"] >> op) + ["rid"])
        out = wf.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
        assert op._disk_paths  # vocab went to disk
        plain = (
            Workflow((["s"] >> ops.Categorify()) + ["rid"])
            .fit(ds)
            .transform(ds)
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, plain)
    finally:
        C._BROADCAST_BYTES = C._BROADCAST_BYTES_SAVE


def test_data_gen_multihot_and_vocab():
    from nvtabular_ray.tools.data_gen import DatasetGen

    prof = {
        "tags": {"dtype": "list", "cardinality": 12, "multi_min": 1, "multi_max": 4},
        "cat": {"dtype": "string", "vocab": ["x", "y", "z"]},
        "val": {"dtype": "double", "min": 0, "max": 10, "mean": 5, "std": 2},
    }
    ds = DatasetGen(prof, seed=3).generate(2000, shard_rows=500)
    t = ds.take_batch(200, batch_format="pyarrow")
    assert pa.types.is_list(t.schema.field("tags").type)
    lens = [len(x) for x in t.column("tags").to_pylist()]
    assert min(lens) >= 1 and max(lens) <= 4
    assert set(t.column("cat").to_pylist()) <= {"x", "y", "z"}
    # list-column Categorify over generated data end-to-end
    wf = Workflow(["tags"] >> ops.Categorify())
    out = wf.fit(ds).transform(ds)
    assert out.count() == 2000
    assert pa.types.is_list(out.schema().base_schema.field("tags").type)
    # determinism: same (seed, shard) regenerates identical data
    t2 = DatasetGen(prof, seed=3).generate(2000, shard_rows=500).take_batch(200, batch_format="pyarrow")
    assert t.equals(t2)
