"""TrainLoader — the training-batch iterator (reference dataloader parity:
nvtabular/loader/torch.py:22-79 semantics on the numpy contract; torch/tf
conversion is a gated one-liner, not testable in this container)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.loader import TrainLoader


def _ds(n=1000, blocks=4, with_lists=False):
    rng = np.random.RandomState(3)
    cols = {
        "c1": pa.array(rng.randint(2, 50, n).astype("int64")),
        "c2": pa.array(rng.randint(2, 9, n).astype("int64")),
        "x": pa.array(rng.normal(size=n)),
        "y": pa.array(rng.uniform(size=n)),
        "label": pa.array(rng.randint(0, 2, n).astype("int64")),
    }
    if with_lists:
        cols["tags"] = pa.array(
            [list(rng.randint(2, 30, rng.randint(0, 6)).astype("int64")) for _ in range(n)],
            pa.list_(pa.int64()),
        )
    return rd.from_arrow(pa.table(cols)).repartition(blocks)


def test_batch_shapes_and_spillover(ray_session):
    n, B = 1000, 256
    loader = TrainLoader(_ds(n), cats=["c1", "c2"], conts=["x", "y"], labels=["label"], batch_size=B)
    batches = list(loader)
    sizes = [b["cats"].shape[0] for b in batches]
    # exact batch_size with spillover across the 4 blocks; one remainder
    assert sizes == [256, 256, 256, 232]
    for b in batches:
        assert b["cats"].dtype == np.int64 and b["cats"].shape[1] == 2
        assert b["conts"].dtype == np.float32 and b["conts"].shape[1] == 2
        assert b["labels"].dtype == np.float32 and b["labels"].shape[1] == 1
    # every row arrives exactly once
    assert sum(sizes) == n


def test_drop_last(ray_session):
    loader = TrainLoader(_ds(1000), cats=["c1"], labels=["label"], batch_size=256, drop_last=True)
    assert [b["cats"].shape[0] for b in loader] == [256, 256, 256]


def test_shuffle_deterministic_per_epoch(ray_session):
    ds = _ds(1000)
    mk = lambda: TrainLoader(ds, cats=["c1"], labels=["label"], batch_size=128,
                             shuffle=True, seed=7)
    a = np.concatenate([b["cats"][:, 0] for b in mk()])
    b = np.concatenate([b["cats"][:, 0] for b in mk()])
    np.testing.assert_array_equal(a, b)  # same seed+epoch -> same order
    loader = mk()
    e1 = np.concatenate([x["cats"][:, 0] for x in loader])
    e2 = np.concatenate([x["cats"][:, 0] for x in loader])  # second epoch
    assert not np.array_equal(e1, e2)  # new epoch reshuffles
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))  # same multiset


def test_list_cats_padded(ray_session):
    loader = TrainLoader(
        _ds(500, with_lists=True),
        cats=["c1", "tags"], conts=["x"], labels=["label"],
        batch_size=200, sparse_max={"tags": 4},
    )
    batches = list(loader)
    got_rows = 0
    for b in batches:
        assert b["tags"].shape[1] == 4 and b["tags"].dtype == np.int64
        assert b["cats"].shape[1] == 1  # scalar cats only
        got_rows += b["tags"].shape[0]
        # padding is code 0 (reserved): no real code can be 0
        lens = (b["tags"] != 0).sum(axis=1)
        assert (lens <= 4).all()
    assert got_rows == 500


def test_list_cat_requires_sparse_max(ray_session):
    with pytest.raises(ValueError, match="sparse_max"):
        TrainLoader(_ds(100, with_lists=True), cats=["tags"], labels=["label"])


def test_truncation_keeps_tail(ray_session):
    t = pa.table({
        "tags": pa.array([[2, 3, 4, 5, 6], [7]], pa.list_(pa.int64())),
        "label": pa.array([0, 1], pa.int64()),
    })
    loader = TrainLoader(rd.from_arrow(t), cats=["tags"], labels=["label"],
                         batch_size=2, sparse_max={"tags": 3})
    (b,) = list(loader)
    np.testing.assert_array_equal(b["tags"], [[4, 5, 6], [7, 0, 0]])


def test_pad_list_column_null_and_sliced_rows(ray_session):
    from nvtabular_ray.loader import _pad_list_column

    a = pa.array([[2, 3], None, [4, 5, 6, 7], [8]], pa.list_(pa.int64()))
    out = _pad_list_column(a.slice(1), 2)  # sliced: starts at the null row
    np.testing.assert_array_equal(out, [[0, 0], [6, 7], [8, 0]])


def test_pad_list_column_null_child_elements(ray_session):
    """ADVICE r3: null ELEMENTS inside a list row must become the reserved
    pad code 0, not int64-cast NaN garbage (to_numpy of a nullable child
    yields float64 + NaN)."""
    from nvtabular_ray.loader import _pad_list_column

    a = pa.array([[2, None], [None], [4, 5, None, 7]], pa.list_(pa.int64()))
    out = _pad_list_column(a, 3)
    np.testing.assert_array_equal(out, [[2, 0, 0], [0, 0, 0], [5, 0, 7]])


def test_loader_golden_contract(ray_session):
    """Frozen batch-layout contract (VERDICT r3 §9): cats int64 (B, n_cats),
    conts float32, labels float32, list cats their own int64 key padded to
    sparse_max with code 0 (tail-truncated), final spillover batch — every
    value pinned against a committed fixture so the pytest-only loader
    surface cannot drift silently."""
    import os

    fixture = os.path.join(os.path.dirname(__file__), "data", "loader_golden.npz")
    golden = np.load(fixture)

    rng = np.random.RandomState(7)
    n = 300
    tab = pa.table(
        {
            "c1": pa.array(rng.randint(2, 50, n).astype("int64")),
            "c2": pa.array(rng.randint(2, 9, n).astype("int64")),
            "x": pa.array(rng.normal(size=n)),
            "y": pa.array(rng.uniform(size=n)),
            "label": pa.array(rng.randint(0, 2, n).astype("int64")),
            "tags": pa.array(
                [list(rng.randint(2, 30, rng.randint(0, 6)).astype("int64")) for _ in range(n)],
                pa.list_(pa.int64()),
            ),
        }
    )
    ds = rd.from_arrow(tab).repartition(3)
    loader = TrainLoader(
        ds, cats=["c1", "c2", "tags"], conts=["x", "y"], labels=["label"],
        batch_size=128, sparse_max={"tags": 4},
    )
    batches = list(loader)
    assert len(batches) == 3  # 128 + 128 + 44 spillover
    for i, b in enumerate(batches):
        assert set(b) == {"cats", "conts", "labels", "tags"}
        assert b["cats"].dtype == np.int64 and b["tags"].dtype == np.int64
        assert b["conts"].dtype == np.float32 and b["labels"].dtype == np.float32
        for k, v in b.items():
            np.testing.assert_array_equal(v, golden[f"b{i}_{k}"], err_msg=f"b{i}_{k}")
