"""NormalizeRobust: median/IQR scaling vs pandas exact quantiles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def test_normalize_robust_matches_pandas(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "rid": np.arange(5000, dtype=np.int64),
            # heavy outlier block: robust scaling must ignore it
            "x": np.concatenate([rng.normal(size=4950), rng.normal(1000, 10, 50)]),
            "y": rng.exponential(3.0, 5000),
        }
    )
    node = ["x", "y"] >> ops.NormalizeRobust()
    out = (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    for c in ("x", "y"):
        med = df[c].quantile(0.5)
        iqr = df[c].quantile(0.75) - df[c].quantile(0.25)
        np.testing.assert_allclose(out[c], (df[c] - med) / iqr, rtol=1e-12)


def test_normalize_robust_degenerate_iqr(ray_session):
    df = pd.DataFrame({"rid": np.arange(100, dtype=np.int64), "x": np.ones(100)})
    node = ["x"] >> ops.NormalizeRobust()
    out = (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
    )
    # IQR == 0 -> centering only (Normalize's std==0 convention)
    np.testing.assert_allclose(out["x"], np.zeros(100))


def test_normalize_robust_validation():
    with pytest.raises(ValueError):
        ops.NormalizeRobust(q_low=0.8, q_high=0.2)


def test_new_r5_ops_save_load_roundtrip(ray_session, tmp_path):
    """Workflow save/load with every round-5 op: served output identical."""
    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 20, n),
            "ts": rng.integers(0, 10**5, n),
            "rid": np.arange(n, dtype=np.int64),
            "role": rng.choice(["a", "b"], n),
            "is_t": rng.random(n) < 0.3,
            "x": rng.normal(size=n),
        }
    )
    node = (
        (["x"] >> ops.NormalizeRobust())
        + (["role"] >> ops.Shift("u", shift=1, sort_cols=["ts", "rid"]))
        + (["x"] >> ops.Ewma("u", alpha=0.3, sort_cols=["ts", "rid"]))
        + (["role"] >> ops.LastWhere("u", cond_col="is_t", sort_cols=["ts", "rid"]))
    )
    wf = Workflow(node + ["rid"])
    ds = rd.from_pandas(df)
    a = wf.fit(ds).transform(ds).to_pandas().sort_values("rid").reset_index(drop=True)
    d = str(tmp_path / "wf")
    wf.save(d)
    b = (
        Workflow.load(d)
        .transform(ds)
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_datepart_matches_pandas(ray_session):
    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.integers(0, 4 * 10**9, n), unit="s"),
        }
    )
    node = ["ts"] >> ops.DatePart(("year", "month", "day", "hour", "isodow", "week", "dayofyear"))
    out = (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    dt = df["ts"].dt
    np.testing.assert_array_equal(out["ts_year"], dt.year)
    np.testing.assert_array_equal(out["ts_month"], dt.month)
    np.testing.assert_array_equal(out["ts_day"], dt.day)
    np.testing.assert_array_equal(out["ts_hour"], dt.hour)
    np.testing.assert_array_equal(out["ts_isodow"], dt.dayofweek + 1)
    np.testing.assert_array_equal(out["ts_week"], dt.isocalendar().week.astype(np.int64))
    np.testing.assert_array_equal(out["ts_dayofyear"], dt.dayofyear)


def test_datepart_validation():
    with pytest.raises(ValueError):
        ops.DatePart(("hour", "bogus"))


def test_datepart_cyclical(ray_session):
    rng = np.random.default_rng(6)
    n = 500
    df = pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(rng.integers(0, 10**9, n), unit="s"),
        }
    )
    node = ["ts"] >> ops.DatePart(("hour", "isodow", "month"), cyclical=True)
    out = (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    dt = df["ts"].dt
    for part, vals, period, off in [
        ("hour", dt.hour, 24, 0),
        ("isodow", dt.dayofweek + 1, 7, 1),
        ("month", dt.month, 12, 1),
    ]:
        phase = (vals - off) * (2 * np.pi / period)
        np.testing.assert_allclose(out[f"ts_{part}_sin"], np.sin(phase), atol=1e-12)
        np.testing.assert_allclose(out[f"ts_{part}_cos"], np.cos(phase), atol=1e-12)
    # periodic adjacency: hour 23 is closer to hour 0 than hour 12 is
    import math

    p23 = (np.sin(2 * np.pi * 23 / 24), np.cos(2 * np.pi * 23 / 24))
    p12 = (np.sin(np.pi), np.cos(np.pi))
    p0 = (0.0, 1.0)
    assert math.dist(p0, p23) < math.dist(p0, p12)
    with pytest.raises(ValueError):
        ops.DatePart(("week",), cyclical=True)  # no period for ISO week


def test_r5_ops_schema_contract(ray_session):
    """Declared output schemas match produced batches for every round-5 op
    (the reference's test_ops_schema pattern: a dtype lie surfaces as a
    named validation error, not a parquet-write surprise)."""
    import pyarrow as pa

    rng = np.random.default_rng(1)
    n = 500
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 10, n),
            "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "rid": np.arange(n, dtype=np.int64),
            "role": rng.choice(["a", "b"], n),
            "is_t": rng.random(n) < 0.3,
            "x": rng.normal(size=n),
        }
    )
    node = (
        (["role", "x"] >> ops.Shift("u", shift=[1, -1], sort_cols=["ts", "rid"]))
        + (["role"] >> ops.LastWhere("u", cond_col="is_t", sort_cols=["ts", "rid"]))
        + (["x"] >> ops.Ewma("u", halflife=60.0, ts_col="ts", sort_cols=["rid"],
                             emit=("mean", "sum", "count")))
        + (["ts"] >> ops.Sessionize("u", "ts", gap=300,
                                    emit=("turn_in_session", "sec_since_session_start"),
                                    tie_cols=["rid"]))
        + (["x"] >> ops.RollingAgg("u", "ts", 600, aggs=("first", "last", "count"),
                                   tie_cols=["rid"]))
        + (["x"] >> ops.NormalizeRobust())
        + (["ts"] >> ops.DatePart(("hour", "isodow"), cyclical=True))
    )
    wf = Workflow(node + ["rid"])
    ds = rd.from_pandas(df)
    wf.fit(ds)
    declared = wf.output_schema(ds)
    out = wf.transform(ds)
    batch = next(iter(out.iter_batches(batch_size=64, batch_format="pyarrow")))
    for name, typ in declared.items():
        assert name in batch.column_names, f"missing declared column {name}"
        if typ is not None:
            assert batch.schema.field(name).type == typ, (
                f"{name}: declared {typ}, produced {batch.schema.field(name).type}"
            )
