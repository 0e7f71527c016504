"""Property test: shuffle_join_chain vs a DuckDB chain on random step
counts, join types, key distributions, and payload names that exercise
the acero-mirroring suffix planner (including deliberate clashes)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nvtabular_ray.pipelines.joins import shuffle_join_chain

_SETTINGS = dict(max_examples=8, deadline=None)

_PAYLOAD_POOL = ["a", "b", "p", "p_r"]  # 'a' clashes with left; p/p_r collide


@st.composite
def chain_cases(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    n = draw(st.integers(1, 200))
    nk = draw(st.integers(1, 8))
    lk = rng.randint(0, nk, n).astype(np.int64)
    if draw(st.booleans()):  # hot key
        lk[: n // 2] = 0
    left = pd.DataFrame({"k": pd.array(lk, dtype="Int64"), "a": rng.rand(n)})
    if draw(st.booleans()):
        left.loc[rng.rand(n) < 0.25, "k"] = pd.NA
    n_steps = draw(st.integers(1, 3))
    steps = []
    for i in range(n_steps):
        m = draw(st.integers(0, 30))
        how = draw(st.sampled_from(["inner", "left", "semi", "anti"]))
        cols = {"rk": pd.array(rng.randint(0, nk + 2, m), dtype="Int64")}
        if how in ("inner", "left"):
            payload = draw(st.sampled_from(_PAYLOAD_POOL))
            cols[payload] = rng.rand(m)
        else:
            payload = None
        steps.append((pd.DataFrame(cols), how, payload))
    thr = draw(st.sampled_from([None, 20]))
    cap = draw(st.sampled_from([1, "auto"]))
    return left, steps, thr, cap


@settings(**_SETTINGS)
@given(chain_cases())
def test_chain_property(case):
    left, steps, thr, cap = case
    rights = []
    for df, how, _ in steps:
        if len(df):
            ds = rd.from_pandas(df).repartition(2)
        else:
            import pyarrow as pa

            tbl = {"rk": pa.array([], pa.int64())}
            for c in df.columns:
                if c != "rk":
                    tbl[c] = pa.array([], pa.float64())
            ds = rd.from_arrow(pa.table(tbl))
        rights.append((ds, "rk", how))

    # expected output names, mirroring acero: suffix iff the ORIGINAL name
    # clashes with the accumulated left-side names at that step
    out_cols, dup = ["k", "a"], False
    for df, how, payload in steps:
        if payload is None:
            continue
        name = payload + "_r" if payload in out_cols else payload
        if name in out_cols:
            dup = True
        out_cols.append(name)

    kw = dict(on="k", num_buckets=3, max_probe_bytes_per_task=cap)
    if thr is not None:
        kw.update(skew_threshold=thr, max_replication=3)
    if dup:
        with pytest.raises(ValueError, match="collides"):
            shuffle_join_chain(rd.from_pandas(left).repartition(3), rights, **kw)
        return
    got = shuffle_join_chain(
        rd.from_pandas(left).repartition(3), rights, **kw
    ).to_pandas()
    if len(got) == 0:
        got = pd.DataFrame({c: [] for c in out_cols})
    got = got[out_cols]

    con = duckdb.connect()
    con.register("l", left)
    sql_from, where = "l", []
    sel = ["l.k", "l.a"]
    idx = 2
    for i, (df, how, payload) in enumerate(steps):
        con.register(f"r{i}", df)
        if how == "inner":
            sql_from += f" JOIN r{i} ON l.k = r{i}.rk"
        elif how == "left":
            sql_from += f" LEFT JOIN r{i} ON l.k = r{i}.rk"
        elif how == "semi":
            where.append(f"EXISTS (SELECT 1 FROM r{i} WHERE r{i}.rk = l.k)")
        else:
            where.append(f"NOT EXISTS (SELECT 1 FROM r{i} WHERE r{i}.rk = l.k)")
        if payload is not None:
            sel.append(f'r{i}.{payload} AS "{out_cols[idx]}"')
            idx += 1
    sql = f"SELECT {', '.join(sel)} FROM {sql_from}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    want = con.execute(sql).df()[out_cols]
    con.close()
    key = lambda df: df.sort_values(out_cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got), key(want), check_dtype=False)
