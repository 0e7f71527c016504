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
