"""shuffle_join_chain: one probe exchange against several same-key build
sides vs DuckDB chains, including mixed inner/left/semi/anti steps,
name-clash suffixing, salting and probe-chunking."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.pipelines.joins import shuffle_join, shuffle_join_chain


def _ds(df, blocks=5):
    return rd.from_pandas(df).repartition(blocks)


def _frames(seed=0, n=500):
    rng = np.random.RandomState(seed)
    lk = rng.randint(0, 30, n).astype(np.int64)
    lk[: n // 3] = 7  # a hot key
    left = pd.DataFrame(
        {"k": pd.array(lk, dtype="Int64"), "a": rng.rand(n)}
    )
    left.loc[rng.choice(n, 12, replace=False), "k"] = pd.NA
    hdr = pd.DataFrame(
        {
            "hk": np.arange(0, 25, dtype=np.int64),  # partial coverage
            "status": [f"s{i % 3}" for i in range(25)],
            "a": rng.rand(25),  # clashes with left's 'a'
        }
    )
    stats = pd.DataFrame(
        {
            "sk": np.arange(5, 35, dtype=np.int64),
            "n_items": rng.randint(1, 9, 30).astype(np.int64),
        }
    )
    elig = pd.DataFrame({"ek": np.arange(0, 20, 2, dtype=np.int64)})
    return left, hdr, stats, elig


def _oracle(sql, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    out = con.execute(sql).df()
    con.close()
    return out


def _cmp(got_ds, want, cols):
    got = got_ds.to_pandas()
    if len(got) == 0:
        got = pd.DataFrame({c: [] for c in cols})
    got, want = got[cols], want[cols]
    key = lambda df: df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(want), check_dtype=False)


CHAIN_SQL = """
    SELECT l.k, l.a, h.status, h.a AS a_r, s.n_items
    FROM l
    JOIN h ON l.k = h.hk
    LEFT JOIN s ON l.k = s.sk
    WHERE EXISTS (SELECT 1 FROM e WHERE e.ek = l.k)
"""
CHAIN_COLS = ["k", "a", "status", "a_r", "n_items"]


def _chain(left, hdr, stats, elig, **kw):
    return shuffle_join_chain(
        _ds(left, 6),
        [
            (_ds(hdr, 2), "hk", "inner"),
            (_ds(stats, 2), "sk", "left"),
            (_ds(elig, 1), "ek", "semi"),
        ],
        on="k",
        num_buckets=4,
        **kw,
    )


def test_chain_mixed_steps_vs_oracle():
    left, hdr, stats, elig = _frames()
    out = _chain(left, hdr, stats, elig)
    want = _oracle(CHAIN_SQL, l=left, h=hdr, s=stats, e=elig)
    _cmp(out, want, CHAIN_COLS)


def test_chain_salted_and_chunked_vs_oracle():
    left, hdr, stats, elig = _frames(seed=3)
    out = _chain(
        left, hdr, stats, elig,
        skew_threshold=40, max_replication=4, max_probe_bytes_per_task=1,
    )
    want = _oracle(CHAIN_SQL, l=left, h=hdr, s=stats, e=elig)
    _cmp(out, want, CHAIN_COLS)


def test_chain_equals_sequential_joins():
    left, hdr, stats, elig = _frames(seed=5)
    chain = _chain(left, hdr, stats, elig).to_pandas()
    seq = shuffle_join(
        shuffle_join(
            shuffle_join(_ds(left, 6), _ds(hdr, 2), on="k", right_on="hk",
                         how="inner", num_buckets=4),
            _ds(stats, 2), on="k", right_on="sk", how="left", num_buckets=4,
        ),
        _ds(elig, 1), on="k", right_on="ek", how="semi", num_buckets=4,
    ).to_pandas()
    key = lambda df: df[CHAIN_COLS].sort_values(CHAIN_COLS, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(chain), key(seq), check_dtype=False)


def test_chain_anti_step_and_no_match_left():
    left, hdr, stats, elig = _frames(seed=7)
    out = shuffle_join_chain(
        _ds(left, 4),
        [
            {"right": _ds(elig, 1), "right_on": "ek", "how": "anti"},
            {"right": _ds(stats, 2), "right_on": "sk", "how": "left"},
        ],
        on="k",
        num_buckets=3,
    )
    want = _oracle(
        """SELECT l.k, l.a, s.n_items FROM l
           LEFT JOIN s ON l.k = s.sk
           WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.ek = l.k)""",
        l=left, s=stats, e=elig,
    )
    _cmp(out, want, ["k", "a", "n_items"])


def test_chain_single_right_matches_shuffle_join():
    left, hdr, _, _ = _frames(seed=9)
    chain = shuffle_join_chain(
        _ds(left, 4), [(_ds(hdr, 2), "hk")], on="k", num_buckets=3
    ).to_pandas()
    single = shuffle_join(
        _ds(left, 4), _ds(hdr, 2), on="k", right_on="hk", how="inner",
        num_buckets=3,
    ).to_pandas()
    cols = ["k", "a", "status", "a_r"]
    key = lambda df: df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(chain), key(single), check_dtype=False)


def test_chain_key_dtype_cast():
    # int32 right keys must hash identically to the left's int64
    left, hdr, _, _ = _frames(seed=11)
    hdr32 = hdr.copy()
    hdr32["hk"] = hdr32["hk"].astype(np.int32)
    a = shuffle_join_chain(_ds(left, 4), [(_ds(hdr, 2), "hk")], on="k",
                           num_buckets=3).to_pandas()
    b = shuffle_join_chain(_ds(left, 4), [(_ds(hdr32, 2), "hk")], on="k",
                           num_buckets=3).to_pandas()
    cols = ["k", "a", "status", "a_r"]
    key = lambda df: df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b), check_dtype=False)


def test_pack_shards_byte_aware():
    # alternating big/small layout: strided g::G packing would stack both
    # big shards in one group; LPT must separate them
    from nvtabular_ray.pipelines.joins import _pack_shards

    sizes = np.array([100.0, 1.0, 100.0, 1.0, 1.0, 1.0])
    groups = _pack_shards(sizes, cap=110.0)
    loads = sorted(sum(sizes[i] for i in g) for g in groups)
    assert loads[-1] <= 110.0 + sizes.max()
    big = [next(gi for gi, g in enumerate(groups) if i in g) for i in (0, 2)]
    assert big[0] != big[1], "the two big shards must land in different groups"
    assert sorted(i for g in groups for i in g) == list(range(6))
    # a single giant shard cannot be split below shard granularity
    assert len(_pack_shards(np.array([500.0]), cap=100.0)) == 1


def test_suffix_collision_refused_at_plan_time():
    # right carries both 'x' and a literal 'x_r' while left has 'x':
    # acero would emit two 'x_r' columns and the select would crash in the
    # remote task — must refuse loudly on the driver instead
    l = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "x": np.arange(10.0)})
    r = pd.DataFrame(
        {
            "rk": np.arange(10, dtype=np.int64),
            "x": np.arange(10.0),
            "x_r": np.arange(10.0),
        }
    )
    with pytest.raises(ValueError, match="collide"):
        shuffle_join(_ds(l, 2), _ds(r, 2), on="k", right_on="rk", how="inner",
                     num_buckets=2)
    with pytest.raises(ValueError, match="collide"):
        shuffle_join_chain(_ds(l, 2), [(_ds(r, 2), "rk")], on="k", num_buckets=2)


def test_chain_rejects_bad_specs():
    left, hdr, _, _ = _frames(seed=13)
    with pytest.raises(ValueError, match="non-empty"):
        shuffle_join_chain(_ds(left), [], on="k")
    with pytest.raises(ValueError, match="inner/left/semi/anti"):
        shuffle_join_chain(_ds(left), [(_ds(hdr), "hk", "full")], on="k")
    with pytest.raises(ValueError, match="arity"):
        shuffle_join_chain(_ds(left), [(_ds(hdr), ["hk", "status"])], on="k")
    # same payload name twice with the same suffix must refuse
    with pytest.raises(ValueError, match="collides"):
        shuffle_join_chain(
            _ds(left), [(_ds(hdr, 2), "hk"), (_ds(hdr, 2), "hk")], on="k",
            num_buckets=3,
        )
    # a typo'd dict key must not silently change join semantics
    with pytest.raises(ValueError, match="unknown spec keys"):
        shuffle_join_chain(
            _ds(left), [{"right": _ds(hdr), "right_on": "hk", "hw": "anti"}],
            on="k",
        )
    with pytest.raises(ValueError, match="elements"):
        shuffle_join_chain(_ds(left), [(_ds(hdr), "hk", "anti", "extra")], on="k")
