"""shuffle_join: distributed M:N hash join vs DuckDB ANSI semantics.

The broadcast path (ops.JoinExternal) is for small right tables; these pin
the co-bucketed large×large exchange: M:N key multiplication, null keys
never matching, left/semi/anti parity, key-name/dtype mismatches, and the
no-build-rows bucket fast paths.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.pipelines.joins import shuffle_join


def _mk_sides(seed=0, n_left=400, n_right=300):
    rng = np.random.RandomState(seed)
    lk = rng.randint(0, 25, n_left).astype(np.int64)
    left = pd.DataFrame(
        {
            "k": pd.array(lk, dtype="Int64"),
            "k2": rng.randint(0, 3, n_left).astype(np.int64),
            "a": rng.rand(n_left),
            "name": [f"l{i % 7}" for i in range(n_left)],
        }
    )
    left.loc[rng.choice(n_left, 10, replace=False), "k"] = pd.NA
    rk = rng.randint(5, 40, n_right).astype(np.int64)  # partial key overlap
    right = pd.DataFrame(
        {
            "rk": pd.array(rk, dtype="Int64"),
            "rk2": rng.randint(0, 3, n_right).astype(np.int64),
            "b": rng.rand(n_right),
            "name": [f"r{i % 5}" for i in range(n_right)],
        }
    )
    right.loc[rng.choice(n_right, 8, replace=False), "rk"] = pd.NA
    return left, right


def _ds(df, blocks=5):
    return rd.from_pandas(df).repartition(blocks)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return out


def _check(got_ds, sql, l, r, cols):
    got = got_ds.to_pandas()[cols]
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    want = con.execute(sql).df()[cols]
    con.close()
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


@pytest.mark.parametrize("num_buckets", [2, 7])
def test_inner_mn_nulls(num_buckets):
    l, r = _mk_sides()
    out = shuffle_join(
        _ds(l), _ds(r), on="k", right_on="rk", how="inner", num_buckets=num_buckets
    )
    assert out.schema().names == ["k", "k2", "a", "name", "rk2", "b", "name_r"]
    _check(
        out,
        """SELECT l.k, l.k2, l.a, l.name, r.rk2, r.b, r.name AS name_r
           FROM l JOIN r ON l.k = r.rk""",
        l,
        r,
        ["k", "k2", "a", "name", "rk2", "b", "name_r"],
    )


def test_left_outer_with_empty_buckets():
    l, r = _mk_sides(seed=1)
    # few right rows -> many buckets see zero build rows (null-pad fast path)
    r_small = r.head(12)
    out = shuffle_join(
        _ds(l), _ds(r_small, blocks=2), on="k", right_on="rk", how="left", num_buckets=16
    )
    _check(
        out,
        """SELECT l.k, l.k2, l.a, l.name, r.rk2, r.b, r.name AS name_r
           FROM l LEFT JOIN r ON l.k = r.rk""",
        l,
        r_small,
        ["k", "k2", "a", "name", "rk2", "b", "name_r"],
    )


def test_multi_key_inner():
    l, r = _mk_sides(seed=2)
    out = shuffle_join(
        _ds(l), _ds(r), on=["k", "k2"], right_on=["rk", "rk2"], how="inner", num_buckets=8
    )
    _check(
        out,
        """SELECT l.k, l.k2, l.a, l.name, r.b, r.name AS name_r
           FROM l JOIN r ON l.k = r.rk AND l.k2 = r.rk2""",
        l,
        r,
        ["k", "k2", "a", "name", "b", "name_r"],
    )


def test_full_outer_coalesced_keys():
    # keys coalesce under the LEFT name (acero parity = COALESCE(l.k, r.rk));
    # few right blocks so some buckets hit the right-only fast path
    l, r = _mk_sides(seed=8)
    out = shuffle_join(
        _ds(l), _ds(r, blocks=2), on="k", right_on="rk", how="full", num_buckets=16
    )
    assert out.schema().names == ["k", "k2", "a", "name", "rk2", "b", "name_r"]
    _check(
        out,
        """SELECT COALESCE(l.k, r.rk) AS k, l.k2, l.a, l.name,
                  r.rk2, r.b, r.name AS name_r
           FROM l FULL JOIN r ON l.k = r.rk""",
        l,
        r,
        ["k", "k2", "a", "name", "rk2", "b", "name_r"],
    )


def test_full_outer_empty_left():
    # no left blocks at all: every right row must still surface
    l, r = _mk_sides(seed=9)
    l0_schema = pa.schema(
        [("k", pa.int64()), ("k2", pa.int64()), ("a", pa.float64()), ("name", pa.string())]
    )
    out = shuffle_join(
        rd.from_arrow(l0_schema.empty_table()), _ds(r), on="k", right_on="rk", how="full"
    )
    got = out.to_pandas()
    assert len(got) == len(r)
    assert got["a"].isna().all()
    assert sorted(got["b"]) == sorted(r["b"])


@pytest.mark.parametrize("how,op", [("semi", "EXISTS"), ("anti", "NOT EXISTS")])
def test_semi_anti(how, op):
    l, r = _mk_sides(seed=3)
    out = shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", how=how, num_buckets=8)
    assert out.schema().names == ["k", "k2", "a", "name"]  # left columns only
    _check(
        out,
        f"""SELECT l.* FROM l WHERE {op}
            (SELECT 1 FROM r WHERE r.rk = l.k)""",
        l,
        r,
        ["k", "k2", "a", "name"],
    )


def test_right_key_dtype_cast():
    l, r = _mk_sides(seed=4)
    r32 = r.dropna(subset=["rk"]).copy()
    r32["rk"] = r32["rk"].astype(np.int32)  # int32 keys vs int64 left
    out = shuffle_join(_ds(l), _ds(r32, blocks=3), on="k", right_on="rk", how="inner")
    _check(
        out,
        """SELECT l.k, l.k2, l.a, l.name, r.rk2, r.b, r.name AS name_r
           FROM l JOIN r ON l.k = r.rk""",
        l,
        r32,
        ["k", "k2", "a", "name", "rk2", "b", "name_r"],
    )


def test_empty_right_side():
    # an empty side must carry a real schema (parquet read / typed arrow
    # table) — Ray erases the schema of zero-row exchanged plans
    l, r = _mk_sides(seed=5)
    r0_schema = pa.schema(
        [("rk", pa.int64()), ("rk2", pa.int64()), ("b", pa.float64()), ("name", pa.string())]
    )

    def r0():
        return rd.from_arrow(r0_schema.empty_table())

    inner = shuffle_join(_ds(l), r0(), on="k", right_on="rk", how="inner")
    assert inner.count() == 0
    assert inner.schema().names == ["k", "k2", "a", "name", "rk2", "b", "name_r"]
    lo = shuffle_join(_ds(l), r0(), on="k", right_on="rk", how="left")
    got = lo.to_pandas()
    assert len(got) == len(l)
    assert got["b"].isna().all()
    anti = shuffle_join(_ds(l), r0(), on="k", right_on="rk", how="anti")
    assert anti.count() == len(l)


def test_schema_erased_empty_side_raises():
    # zero-row plans that crossed an exchange have NO recoverable schema;
    # the join must fail loudly, not emit a wrong-shaped result
    l, r = _mk_sides(seed=7)
    erased = _ds(r.head(0), blocks=1)  # repartition of empty -> placeholder
    with pytest.raises(ValueError, match="no recoverable schema"):
        shuffle_join(_ds(l), erased, on="k", right_on="rk", how="inner")


def _mk_skewed(seed=10, n_left=3000, n_right=120):
    rng = np.random.RandomState(seed)
    lk = rng.randint(0, 20, n_left).astype(np.int64)
    lk[: int(n_left * 0.6)] = 7  # one key owns 60% of the probe side
    left = pd.DataFrame({"k": lk, "a": rng.rand(n_left)})
    right = pd.DataFrame(
        {"rk": rng.randint(0, 15, n_right).astype(np.int64), "b": rng.rand(n_right)}
    )
    return left, right


def test_detect_hot_key_hashes():
    from nvtabular_ray.functions.hashing import hash64_columns
    from nvtabular_ray.pipelines.joins import detect_hot_key_hashes

    l, _ = _mk_skewed()
    hashes, counts = detect_hot_key_hashes(_ds(l, blocks=6), "k", threshold=500)
    expect = hash64_columns(pa.table({"k": pa.array([7], pa.int64())}), ["k"])[0]
    assert hashes.tolist() == [int(expect)]
    assert counts.tolist() == [int((l["k"] == 7).sum())]
    # below-threshold keys never reach the driver
    hashes_all, counts_all = detect_hot_key_hashes(_ds(l, blocks=6), "k", threshold=0)
    assert len(hashes_all) == l["k"].nunique()
    assert counts_all.sum() == len(l)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_salted_join_matches_oracle(how):
    # hot probe key salted across sub-buckets + replicated build rows must
    # be EXACT — M:N multiplication included (key 7 also repeats in right)
    l, r = _mk_skewed()
    out = shuffle_join(
        _ds(l, blocks=6),
        _ds(r, blocks=3),
        on="k",
        right_on="rk",
        how=how,
        num_buckets=4,
        skew_threshold=200,
        max_replication=5,
    )
    if how in ("semi", "anti"):
        op = "EXISTS" if how == "semi" else "NOT EXISTS"
        sql = f"SELECT l.* FROM l WHERE {op} (SELECT 1 FROM r WHERE r.rk = l.k)"
        cols = ["k", "a"]
    else:
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = f"SELECT l.k, l.a, r.b FROM l {kw} r ON l.k = r.rk"
        cols = ["k", "a", "b"]
    _check(out, sql, l, r, cols)


def test_salted_join_hot_null_keys():
    # the commonest real hot key is NULL: 60% null probe keys get salted
    # (they hash somewhere) but must still emit exactly once, unmatched,
    # in a left join — and vanish from inner
    rng = np.random.RandomState(11)
    n = 2000
    lk = pd.array(rng.randint(0, 10, n), dtype="Int64")
    lk[: int(n * 0.6)] = pd.NA
    l = pd.DataFrame({"k": lk, "a": rng.rand(n)})
    r = pd.DataFrame(
        {"rk": pd.array(rng.randint(0, 8, 60), dtype="Int64"), "b": rng.rand(60)}
    )
    for how, kw in (("left", "LEFT JOIN"), ("inner", "JOIN")):
        out = shuffle_join(
            _ds(l, blocks=6), _ds(r, blocks=2), on="k", right_on="rk",
            how=how, num_buckets=4, skew_threshold=100,
        )
        _check(out, f"SELECT l.k, l.a, r.b FROM l {kw} r ON l.k = r.rk", l, r,
               ["k", "a", "b"])


def test_salted_join_multi_key():
    # composite-key salting: the hot (7, 1) pair dominates the probe side
    rng = np.random.RandomState(12)
    n = 3000
    k1 = rng.randint(0, 6, n).astype(np.int64)
    k2 = rng.randint(0, 4, n).astype(np.int64)
    k1[: int(n * 0.5)], k2[: int(n * 0.5)] = 7, 1
    l = pd.DataFrame({"k1": k1, "k2": k2, "a": rng.rand(n)})
    r = pd.DataFrame(
        {
            "rk1": np.repeat(np.arange(8, dtype=np.int64), 8),
            "rk2": np.tile(np.arange(4, dtype=np.int64), 16),
            "b": rng.rand(64),
        }
    )
    out = shuffle_join(
        _ds(l, blocks=6), _ds(r, blocks=2), on=["k1", "k2"],
        right_on=["rk1", "rk2"], how="inner", num_buckets=4, skew_threshold=300,
    )
    _check(
        out,
        "SELECT l.k1, l.k2, l.a, r.b FROM l JOIN r ON l.k1 = r.rk1 AND l.k2 = r.rk2",
        l, r, ["k1", "k2", "a", "b"],
    )


def test_salted_thin_per_block_distributes():
    # a hot key with ONE row per block: per-block rank restarts at 0, so
    # without the per-block offset every probe row would land in sub-bucket
    # base+0 — the offset must spread them across blocks
    from nvtabular_ray.functions.hashing import hash64_columns
    from nvtabular_ray.pipelines.joins import _split_to_buckets

    hot_hash = hash64_columns(pa.table({"k": pa.array([7], pa.int64())}), ["k"])
    reps = np.array([4], dtype=np.int64)
    base = np.array([0], dtype=np.int64)
    hot = (hot_hash.astype(np.uint64), reps, base)
    B = 4
    rng = np.random.RandomState(3)
    seen_buckets = set()
    for blk in range(24):
        cold = rng.randint(100, 200, 5).astype(np.int64)
        tbl = pa.table({"k": pa.array(np.r_[cold, 7]), "v": pa.array(rng.rand(6))})
        *shards, sizes = _split_to_buckets(tbl, ["k"], B, B + 4, hot, replicate=False)
        for sb in range(B, B + 4):
            if shards[sb].num_rows:
                seen_buckets.add(sb)
    assert len(seen_buckets) > 1, "thin-per-block hot rows all collapsed into one sub-bucket"


def test_salted_threshold_zero_raises():
    l, r = _mk_skewed()
    with pytest.raises(ValueError, match="skew_threshold"):
        shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", skew_threshold=0)


def test_detect_hot_key_types_align():
    # analyze side carries int32 keys while the probe is int64: without the
    # key_types cast the hashes would never match the probe's
    from nvtabular_ray.pipelines.joins import detect_hot_key_hashes

    l, _ = _mk_skewed()
    l32 = l.copy()
    l32["k"] = l32["k"].astype(np.int32)
    h64, c64 = detect_hot_key_hashes(_ds(l, blocks=4), "k", threshold=500)
    h32, c32 = detect_hot_key_hashes(
        _ds(l32, blocks=4), "k", threshold=500, key_types=[pa.int64()]
    )
    assert h32.tolist() == h64.tolist()
    assert c32.tolist() == c64.tolist()


def test_detect_hot_key_cap():
    # max_hot_keys keeps only the heaviest hitters — bounded driver collect
    from nvtabular_ray.pipelines.joins import detect_hot_key_hashes

    l, _ = _mk_skewed()
    full_h, full_c = detect_hot_key_hashes(_ds(l, blocks=6), "k", threshold=0)
    capped_h, capped_c = detect_hot_key_hashes(
        _ds(l, blocks=6), "k", threshold=0, max_hot_keys=3
    )
    assert len(capped_h) == 3
    # the capped set is exactly the 3 largest counts of the full set
    assert sorted(capped_c.tolist()) == sorted(full_c.tolist())[-3:]
    assert set(capped_h.tolist()) <= set(full_h.tolist())


def test_salted_join_capped_hot_keys():
    # with a cap of 1 only the dominant key is salted; result still exact
    l, r = _mk_skewed()
    out = shuffle_join(
        _ds(l, blocks=6),
        _ds(r, blocks=3),
        on="k",
        right_on="rk",
        how="inner",
        num_buckets=4,
        skew_threshold=50,  # would qualify many keys...
        max_hot_keys=1,  # ...but only the hottest gets sub-buckets
    )
    _check(out, "SELECT l.k, l.a, r.b FROM l JOIN r ON l.k = r.rk", l, r, ["k", "a", "b"])


def test_salted_full_raises():
    l, r = _mk_skewed()
    with pytest.raises(ValueError, match="full"):
        shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", how="full", skew_threshold=10)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_chunked_join_matches_oracle(how):
    # max_probe_bytes_per_task=1 forces EVERY bucket to fan out to one
    # task per probe shard — maximal chunking must stay exact, M:N included
    l, r = _mk_skewed()
    out = shuffle_join(
        _ds(l, blocks=6),
        _ds(r, blocks=3),
        on="k",
        right_on="rk",
        how=how,
        num_buckets=4,
        max_probe_bytes_per_task=1,
    )
    if how in ("semi", "anti"):
        op = "EXISTS" if how == "semi" else "NOT EXISTS"
        sql = f"SELECT l.* FROM l WHERE {op} (SELECT 1 FROM r WHERE r.rk = l.k)"
        cols = ["k", "a"]
    else:
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = f"SELECT l.k, l.a, r.b FROM l {kw} r ON l.k = r.rk"
        cols = ["k", "a", "b"]
    _check(out, sql, l, r, cols)


def test_chunked_plus_salted_compose():
    # salted sub-buckets are measured and chunked like any bucket
    l, r = _mk_skewed()
    out = shuffle_join(
        _ds(l, blocks=6), _ds(r, blocks=3), on="k", right_on="rk", how="inner",
        num_buckets=4, skew_threshold=200, max_replication=3,
        max_probe_bytes_per_task=1,
    )
    _check(out, "SELECT l.k, l.a, r.b FROM l JOIN r ON l.k = r.rk", l, r,
           ["k", "a", "b"])


def test_chunked_explicit_cap_full_raises():
    l, r = _mk_sides(seed=20)
    with pytest.raises(ValueError, match="full"):
        shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", how="full",
                     max_probe_bytes_per_task=1 << 20)
    # "auto" silently disables for full — must still work
    out = shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", how="full")
    assert out.count() > 0


def test_chunked_bad_cap_raises():
    l, r = _mk_sides(seed=21)
    with pytest.raises(ValueError, match="positive"):
        shuffle_join(_ds(l), _ds(r), on="k", right_on="rk",
                     max_probe_bytes_per_task=0)


def test_salted_max_replication_below_two_raises():
    # reps=0 would silently drop every hot-key row; must refuse loudly
    l, r = _mk_skewed()
    for bad in (0, 1, -3):
        with pytest.raises(ValueError, match="max_replication"):
            shuffle_join(
                _ds(l), _ds(r), on="k", right_on="rk", how="inner",
                skew_threshold=10, max_replication=bad,
            )


def test_detect_hot_key_single_bucket():
    # num_buckets=1: num_returns=1 returns ONE bare ref to the whole value
    from nvtabular_ray.functions.hashing import hash64_columns
    from nvtabular_ray.pipelines.joins import detect_hot_key_hashes

    l, _ = _mk_skewed()
    hashes, counts = detect_hot_key_hashes(_ds(l, blocks=6), "k", threshold=500, num_buckets=1)
    expect = hash64_columns(pa.table({"k": pa.array([7], pa.int64())}), ["k"])[0]
    assert hashes.tolist() == [int(expect)]
    assert counts.tolist() == [int((l["k"] == 7).sum())]


def test_salted_join_periodic_hot_layout():
    # hot rows at strictly even positions: a global row-position salt would
    # send every hot probe row to sub-bucket 0; rank-within-key round-robin
    # must still be exact AND actually distribute
    rng = np.random.RandomState(13)
    n = 4000
    lk = rng.randint(0, 10, n).astype(np.int64)
    lk[::2] = 7  # hot key on every even row
    l = pd.DataFrame({"k": lk, "a": rng.rand(n)})
    r = pd.DataFrame(
        {"rk": rng.randint(0, 10, 50).astype(np.int64), "b": rng.rand(50)}
    )
    out = shuffle_join(
        _ds(l, blocks=4), _ds(r, blocks=2), on="k", right_on="rk", how="left",
        num_buckets=3, skew_threshold=100, max_replication=4,
    )
    _check(out, "SELECT l.k, l.a, r.b FROM l LEFT JOIN r ON l.k = r.rk", l, r,
           ["k", "a", "b"])


def test_rejects_bad_args():
    l, r = _mk_sides(seed=6)
    with pytest.raises(ValueError, match="how"):
        shuffle_join(_ds(l), _ds(r), on="k", right_on="rk", how="outer")
    with pytest.raises(KeyError, match="left key"):
        shuffle_join(_ds(l), _ds(r), on="missing", right_on="rk")
    with pytest.raises(ValueError, match="length"):
        shuffle_join(_ds(l), _ds(r), on=["k", "k2"], right_on=["rk"])
