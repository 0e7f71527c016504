"""Regression tests for the pyarrow 16.1 multi-key null-group bug.

Upstream bug (round-4 verdict §1): ``pa.Table.group_by`` with >=2 key
columns where one contains nulls emits ~one duplicate null-key group per
32-row internal mini-batch (666 rows, keys (string-with-nulls, int64) ->
64 groups instead of 12). Single-key grouping with nulls and null-free
multi-key grouping are both correct. ``arrow_utils.null_safe_group_by``
works around it with a (fill, validity-key) encoding; these tests pin the
helper directly AND every routed fit-partial site end-to-end, at n >= 666
so the upstream repro threshold is exceeded.

Reference semantics being protected: null categories are first-class
groups (/root/reference/nvtabular/ops/target_encoding.py:54-61,
categorify.py:52-55).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops
from nvtabular_ray.arrow_utils import null_safe_group_by

N = 1000  # > the 666-row upstream repro threshold


def _nullable_table(n=N, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.choice(["a", "b", "c", None], size=n).tolist()
    folds = rng.integers(0, 3, size=n)
    return pa.table(
        {"k": keys, "f": folds, "v": rng.normal(size=n)}
    )


def test_upstream_bug_still_present_and_helper_fixes_it():
    """If this starts failing on the RAW path, pyarrow was upgraded and the
    workaround can be retired (helper short-circuit covers removal)."""
    t = _nullable_table()
    raw = t.group_by(["k", "f"], use_threads=False).aggregate([("v", "sum")])
    fixed = null_safe_group_by(t, ["k", "f"], [("v", "sum")])
    assert fixed.num_rows == 12
    if raw.num_rows == 12:
        pytest.skip("pyarrow multi-key null-group bug fixed upstream")
    assert raw.num_rows > 12  # bug present: helper is load-bearing


def test_helper_matches_pandas_dropna_false():
    t = _nullable_table()
    got = (
        null_safe_group_by(t, ["k", "f"], [("v", "sum"), ("v", "count")])
        .to_pandas()
        .sort_values(["f", "k"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        t.to_pandas()
        .groupby(["k", "f"], dropna=False)["v"]
        .agg(v_sum="sum", v_count="count")
        .reset_index()
        .sort_values(["f", "k"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) == 12
    np.testing.assert_allclose(got["v_sum"], exp["v_sum"])
    np.testing.assert_array_equal(got["v_count"], exp["v_count"])
    assert (got["k"].isna() == exp["k"].isna()).all()


def test_helper_distinct_all_null_and_collision():
    t = _nullable_table()
    assert null_safe_group_by(t, ["k", "f"], []).num_rows == 12
    # all-null key column: any-type fill path
    t2 = pa.table({"k": pa.nulls(N, pa.string()), "f": t["f"], "v": t["v"]})
    g2 = null_safe_group_by(t2, ["k", "f"], [("v", "count")])
    assert g2.num_rows == 3 and g2.column("k").null_count == 3
    assert g2.schema.field("k").type == pa.string()
    # a real value equal to the fill value must NOT merge with nulls
    t3 = pa.table({"k": ["a", None] * 333, "f": [1] * 666, "v": [1.0] * 666})
    g3 = null_safe_group_by(t3, ["k", "f"], [("v", "sum")]).to_pydict()
    assert sorted(g3["v_sum"]) == [333.0, 333.0]
    # schema/column order identical to the plain call on null-free input
    tnf = pa.table({"k": ["a", "b"] * 333, "f": [1, 2] * 333, "v": [1.0] * 666})
    a = tnf.group_by(["k", "f"], use_threads=False).aggregate([("v", "sum")])
    b = null_safe_group_by(tnf, ["k", "f"], [("v", "sum")])
    assert a.schema == b.schema


def test_combine_partial_nullable_multikey():
    from nvtabular_ray.functions.aggregates import combine_partial

    t = _nullable_table()
    parts = pa.table(
        {
            "k": t["k"],
            "f": t["f"],
            "c": pa.array(np.ones(N, dtype=np.int64)),
            "s": t["v"],
        }
    )
    merged = combine_partial(parts, ["k", "f"], {"c": "sum", "s": "sum"})
    assert merged.num_rows == 12
    # idempotent: a second merge pass must be a no-op on cardinality
    again = combine_partial(merged, ["k", "f"], {"c": "sum", "s": "sum"})
    assert again.num_rows == 12
    assert int(pa.compute.sum(again["c"]).as_py()) == N


@pytest.fixture()
def te_df():
    rng = np.random.default_rng(11)
    n = 4000
    cat = rng.choice(["a", "b", "c", "d", None], size=n)
    return pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "cat": pd.array(cat, dtype="object"),
            "y": rng.normal(5.0, 2.0, n),
        }
    )


@pytest.mark.parametrize("distributed", [False, True])
def test_te_kfold3_nullable_key_matches_sentinel(ray_session, te_df, distributed):
    """Null is a first-class TE category: encoding with nulls present must
    equal encoding of the same data with nulls replaced by a fresh sentinel
    category (the sentinel run never has multi-key nulls, so it cannot hit
    the upstream bug)."""

    def run(df):
        kw = dict(kfold=3, fold_on=["row_id"], p_smooth=20, out_dtype="float64")
        if distributed:
            kw["distributed"] = True
        wf = Workflow((["cat"] >> ops.TargetEncoding("y", **kw)) + ["row_id"])
        ds = rd.from_pandas(df)
        return (
            wf.fit(ds)
            .transform(ds)
            .to_pandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )

    with_null = run(te_df)
    sent = te_df.copy()
    sent["cat"] = sent["cat"].fillna("__SENTINEL__")
    with_sent = run(sent)
    np.testing.assert_allclose(
        with_null["TE_cat_y"], with_sent["TE_cat_y"], rtol=0, atol=1e-12
    )


def test_exact_dedup_multicol_null_keys(ray_session):
    from nvtabular_ray.functions.dedup import exact_dedup

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "k1": rng.choice(["x", "y", None], size=n),
            "k2": rng.integers(0, 4, size=n),
            "ord": np.arange(n, dtype=np.int64),
        }
    )
    out = (
        exact_dedup(rd.from_pandas(df), ["k1", "k2"], "ord")
        .to_pandas()
        .sort_values("ord")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values("ord")
        .drop_duplicates(["k1", "k2"])  # pandas keeps null keys as groups
        .reset_index(drop=True)
    )
    assert len(out) == len(exp) == 12
    pd.testing.assert_frame_equal(out, exp)
