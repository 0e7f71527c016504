"""Deterministic hash sampling/splitting: partitioning invariance, entity
cohesion, fraction accuracy."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.functions.sampling import hash_sample, hash_split


def _ds(df, blocks):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_hash_sample_partitioning_invariant():
    df = pd.DataFrame({"k": np.arange(5000, dtype="int64"), "v": np.arange(5000)})
    a = hash_sample(_ds(df, 1), "k", 0.2).to_pandas().sort_values("k").reset_index(drop=True)
    b = hash_sample(_ds(df, 7), "k", 0.2).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # fraction within sampling noise of 20%
    assert 0.17 < len(a) / len(df) < 0.23


def test_hash_split_entity_cohesion_and_fractions():
    rng = np.random.RandomState(3)
    users = rng.randint(0, 500, size=8000)
    df = pd.DataFrame({"row": np.arange(8000), "user": users})
    out = hash_split(_ds(df, 4), "user", {"train": 0.8, "valid": 0.1, "test": 0.1}).to_pandas()
    # every row of one user gets the same label
    assert (out.groupby("user")["split"].nunique() == 1).all()
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert set(out["split"].unique()) <= {"train", "valid", "test"}


def test_hash_split_rejects_bad_fractions():
    df = pd.DataFrame({"k": [1, 2, 3]})
    with pytest.raises(ValueError):
        hash_split(_ds(df, 1), "k", {"a": 0.5, "b": 0.4})


def test_corpus_mix_weights_and_determinism():
    from nvtabular_ray.functions.sampling import corpus_mix

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "k": np.arange(9000, dtype="int64"),
            "src": rng.choice(["a", "b", "c"], size=9000),
        }
    )
    w = {"a": 1.0, "b": 0.3}  # c absent -> dropped
    out = corpus_mix(_ds(df, 3), "src", "k", w).to_pandas()
    frac = out["src"].value_counts() / df["src"].value_counts()
    assert frac["a"] == 1.0
    assert 0.25 < frac["b"] < 0.35
    assert "c" not in set(out["src"])
    out2 = corpus_mix(_ds(df, 8), "src", "k", w).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("k").reset_index(drop=True),
        out2.sort_values("k").reset_index(drop=True),
    )


def test_top_k_per_group_matches_pandas():
    from nvtabular_ray.functions.sampling import top_k_per_group

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y", "z", "w"], size=500),
            "score": rng.permutation(500).astype("float64"),
            "i": np.arange(500, dtype="int64"),
        }
    )
    for blocks in (3, 9):
        out = (
            top_k_per_group(_ds(df, blocks), "g", "score", 7, tie_cols="i")
            .to_pandas()
            .sort_values(["g", "i"])
            .reset_index(drop=True)
        )
        exp = (
            df.sort_values(["g", "score", "i"], ascending=[True, False, True])
            .groupby("g")
            .head(7)
            .sort_values(["g", "i"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, exp)


def test_top_k_per_group_ascending_and_small_groups():
    from nvtabular_ray.functions.sampling import top_k_per_group

    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "score": [3.0, 1.0, 2.0], "i": [0, 1, 2]}
    )
    out = (
        top_k_per_group(_ds(df, 2), "g", "score", 2, descending=False, tie_cols="i")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # group b has 1 row < k -> kept whole; ascending keeps the smallest
    pd.testing.assert_frame_equal(out, df)
