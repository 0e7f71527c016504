"""Sequence packing invariants: capacity respected, all items binned,
oversize singletons, determinism, bin ids globally unique."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nvtabular_ray.functions.packing import pack_bins_ffd, pack_sequences


def test_pack_bins_ffd_invariants():
    rng = np.random.RandomState(7)
    sizes = rng.randint(1, 900, size=2000)
    cap = 2048
    bins = pack_bins_ffd(sizes, cap)
    sums = pd.Series(sizes).groupby(bins).sum()
    assert (sums <= cap).all()
    # FFD should be reasonably dense: within 25% of the fractional bound
    assert len(sums) <= int(np.ceil(sizes.sum() / cap) * 1.25)
    # deterministic
    assert np.array_equal(bins, pack_bins_ffd(sizes, cap))


def test_pack_bins_oversize_singleton():
    bins = pack_bins_ffd(np.array([5000, 10, 10]), 100)
    assert (np.array(bins) >= 0).all()
    # the oversize item shares its bin with nobody
    assert (bins == bins[0]).sum() == 1


def test_pack_sequences_dataset():
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype="int64"),
            "n_tokens": rng.randint(1, 700, size=3000).astype("int64"),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = pack_sequences(ds, "n_tokens", "doc_id", capacity=1024).to_pandas()
    assert len(out) == 3000
    g = out.groupby("bin_id")
    assert (g["n_tokens"].sum() <= 1024).all()
    # bin_fill is consistent with the actual bin contents
    assert (g["n_tokens"].sum() == g["bin_fill"].first()).all()
    # bin_id = min member id
    assert (g.apply(lambda x: x["doc_id"].min() == x.name)).all()


def test_shard_by_token_budget_matches_sequential():
    from nvtabular_ray.functions.packing import shard_by_token_budget

    rng = np.random.RandomState(3)
    n = 500
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_tokens": rng.randint(1, 400, size=n).astype(np.int64),
        }
    )
    # shuffled input across several blocks: the op must sort first
    ds = rd.from_arrow(
        pa.Table.from_pandas(df.sample(frac=1.0, random_state=9), preserve_index=False)
    ).repartition(7)
    out = (
        shard_by_token_budget(ds, budget=1000, size_col="n_tokens", order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    before = np.concatenate([[0], np.cumsum(df["n_tokens"].to_numpy())[:-1]])
    expect = before // 1000
    assert np.array_equal(out["shard_id"].to_numpy(), expect)
    # contiguity: shard ids are non-decreasing in doc order and start at 0
    s = out["shard_id"].to_numpy()
    assert s[0] == 0 and (np.diff(s) >= 0).all()
    # every shard except the last crosses its budget boundary once the
    # overrunning tail row is included
    tot = out.groupby("shard_id")["n_tokens"].sum()
    assert (tot.iloc[:-1].cumsum() >= 1000 * np.arange(1, len(tot))).all()


def test_shard_by_token_budget_nulls_and_empty():
    from nvtabular_ray.functions.packing import shard_by_token_budget

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "n_tokens": pa.array([500, None, 600], pa.int64()),
        }
    )
    out = (
        shard_by_token_budget(rd.from_arrow(t), budget=1000, size_col="n_tokens", order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
    )
    # null counts as 0 tokens: prefixes 0, 500, 500 -> shards 0, 0, 0
    assert out["shard_id"].tolist() == [0, 0, 0]

    with np.testing.assert_raises(ValueError):
        shard_by_token_budget(rd.from_arrow(t), budget=0, size_col="n_tokens", order_col="doc_id")


def test_shard_by_token_budget_sorted_fast_path():
    """Pre-sorted multi-block input must take the sort-skipping fast path
    and produce the identical result; boundary-overlapping blocks and
    string keys exercise the globally-sorted check."""
    from nvtabular_ray.functions.packing import shard_by_token_budget

    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.array([f"doc{i:06d}" for i in range(n)], dtype=object),
            "n_tokens": rng.randint(1, 300, size=n).astype(np.int64),
        }
    )
    before = np.concatenate([[0], np.cumsum(df["n_tokens"].to_numpy())[:-1]])
    expect = before // 777

    sorted_ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(5)
    out_sorted = (
        shard_by_token_budget(sorted_ds, budget=777, size_col="n_tokens", order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out_sorted["shard_id"].to_numpy(), expect)

    shuffled = rd.from_arrow(
        pa.Table.from_pandas(df.sample(frac=1.0, random_state=4), preserve_index=False)
    ).repartition(5)
    out_shuffled = (
        shard_by_token_budget(shuffled, budget=777, size_col="n_tokens", order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out_shuffled["shard_id"].to_numpy(), expect)

    # a single out-of-order pair across a block boundary must fall back
    df2 = df.copy()
    df2.iloc[[79, 81]] = df2.iloc[[81, 79]].to_numpy()  # swap across block edge
    near_sorted = rd.from_arrow(
        pa.Table.from_pandas(df2, preserve_index=False)
    ).repartition(5)
    out2 = (
        shard_by_token_budget(near_sorted, budget=777, size_col="n_tokens", order_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.array_equal(out2["shard_id"].to_numpy(), expect)
