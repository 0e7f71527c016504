"""Property test: salted shuffle_join == unsalted shuffle_join == DuckDB
on adversarial key distributions (hot keys, null keys, empty sides,
thresholds that qualify everything, caps that salt almost nothing)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nvtabular_ray.pipelines.joins import shuffle_join

_SETTINGS = dict(max_examples=8, deadline=None)


@st.composite
def join_cases(draw):
    n_left = draw(st.integers(1, 300))
    n_keys = draw(st.integers(1, 6))
    hot_key = draw(st.integers(0, n_keys - 1))
    hot_frac = draw(st.sampled_from([0.0, 0.4, 0.9]))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    lk = rng.randint(0, n_keys, n_left).astype(np.int64)
    lk[: int(n_left * hot_frac)] = hot_key
    null_frac = draw(st.sampled_from([0.0, 0.3]))
    left = pd.DataFrame({"k": pd.array(lk, dtype="Int64"), "a": rng.rand(n_left)})
    if null_frac:
        left.loc[rng.rand(n_left) < null_frac, "k"] = pd.NA
    n_right = draw(st.integers(0, 40))
    right = pd.DataFrame(
        {
            # partial overlap: some right keys never occur on the left
            "rk": pd.array(
                rng.randint(0, n_keys + 2, n_right), dtype="Int64"
            ),
            "b": rng.rand(n_right),
        }
    )
    how = draw(st.sampled_from(["inner", "left", "semi", "anti"]))
    threshold = draw(st.sampled_from([1, 5, 50]))
    cap = draw(st.sampled_from([1, 3, 64]))
    chunk_cap = draw(st.sampled_from([1, 1000, "auto"]))
    return left, right, how, threshold, cap, chunk_cap


@settings(**_SETTINGS)
@given(join_cases())
def test_salted_join_property(case):
    left, right, how, threshold, cap, chunk_cap = case
    if len(right):
        rds = rd.from_pandas(right).repartition(2)
    else:
        # an empty from_pandas erases the schema (documented rejection);
        # a schema-carrying empty Arrow table drives the no-build-rows path
        import pyarrow as pa

        rds = rd.from_arrow(
            pa.table({"rk": pa.array([], pa.int64()), "b": pa.array([], pa.float64())})
        )
    out = shuffle_join(
        rd.from_pandas(left).repartition(4),
        rds,
        on="k",
        right_on="rk",
        how=how,
        num_buckets=3,
        skew_threshold=threshold,
        max_hot_keys=cap,
        max_replication=4,
        max_probe_bytes_per_task=chunk_cap,
    )
    if how in ("semi", "anti"):
        op = "EXISTS" if how == "semi" else "NOT EXISTS"
        sql = f"SELECT l.k, l.a FROM l WHERE {op} (SELECT 1 FROM r WHERE r.rk = l.k)"
        cols = ["k", "a"]
    else:
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        sql = f"SELECT l.k, l.a, r.b FROM l {kw} r ON l.k = r.rk"
        cols = ["k", "a", "b"]
    got = out.to_pandas()
    if len(got) == 0:
        got = pd.DataFrame({c: [] for c in cols})
    got = got[cols]
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(sql).df()[cols]
    con.close()
    key = lambda df: df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(got), key(want), check_dtype=False, check_exact=False
    )
