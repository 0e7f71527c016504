"""Distributed Categorify encode_type='combo': tuple vocabularies fitted and
encoded without the driver ever holding the vocab, matching the broadcast
combo path code-for-code (same (count desc, cols asc) ordering, same OOV
hash, same any-null-member -> null-code rule)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


@pytest.fixture()
def df():
    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "row_id": np.arange(n, dtype=np.int64),
            "a": rng.integers(0, 25, n).astype(str),
            "b": rng.integers(0, 8, n),
        }
    )
    # values containing the composite separator must not collide
    df.loc[df.index[:40], "a"] = "x:" + df.loc[df.index[:40], "b"].astype(str)
    # null members -> null code
    df.loc[df.index[10:20], "a"] = None
    df.loc[df.index[15:25], "b"] = pd.array([None] * 10, dtype="Int64")
    return df


def _codes(df, **kw):
    node = [["a", "b"]] >> ops.Categorify(encode_type="combo", **kw)
    wf = Workflow(node + ["row_id"])
    ds = rd.from_pandas(df)
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("row_id").reset_index(drop=True)
    return out["a_b"].to_numpy(), wf


@pytest.mark.parametrize("kw", [{}, {"freq_threshold": 2}, {"max_size": 20}])
def test_combo_distributed_matches_broadcast(ray_session, df, kw):
    base, _ = _codes(df, **kw)
    dist, wf = _codes(df, distributed=True, split_out=4, **kw)
    np.testing.assert_array_equal(base, dist)
    cat = [n.op for n in wf._op_nodes() if isinstance(n.op, ops.Categorify)][0]
    assert cat.distributed_vocabs["a_b"]["combo"] is True
    # null counting parity: any-null-member rows
    anynull = int((df["a"].isna() | df["b"].isna()).sum())
    assert cat.null_counts["a_b"] == anynull


def test_combo_distributed_oov_on_unseen(ray_session, df):
    """Tuples absent from the fitted vocab get the broadcast-identical
    stable OOV hash codes."""
    fit_df = df.iloc[: len(df) // 2].reset_index(drop=True)
    df = df.copy()
    # guarantee genuinely unseen tuples in the transform traffic
    tail = df.index[-50:]
    df.loc[tail, "a"] = [f"unseen{i}" for i in range(50)]
    node_b = [["a", "b"]] >> ops.Categorify(encode_type="combo", num_buckets=16)
    node_d = [["a", "b"]] >> ops.Categorify(
        encode_type="combo", num_buckets=16, distributed=True, split_out=4
    )
    wf_b = Workflow(node_b + ["row_id"])
    wf_d = Workflow(node_d + ["row_id"])
    fit_ds = rd.from_pandas(fit_df)
    full_ds = rd.from_pandas(df)
    out_b = (
        wf_b.fit(fit_ds).transform(full_ds).to_pandas().sort_values("row_id")["a_b"].to_numpy()
    )
    out_d = (
        wf_d.fit(fit_ds).transform(full_ds).to_pandas().sort_values("row_id")["a_b"].to_numpy()
    )
    np.testing.assert_array_equal(out_b, out_d)
    # OOV codes actually exercised (unseen tuples exist in the second half)
    from nvtabular_ray.ops.categorify import OOV_OFFSET

    assert ((out_b >= OOV_OFFSET) & (out_b < OOV_OFFSET + 16)).any()


def test_combo_distributed_mixed_with_singles(ray_session, df):
    """A combo group and scalar columns on the same distributed op share the
    stamp/assemble plan (one full-row exchange total)."""
    node = ([["a", "b"]] >> ops.Categorify(encode_type="combo", distributed=True, split_out=4)) + (
        ["a"] >> ops.Categorify(distributed=True, split_out=4)
    )
    wf = Workflow(node + ["row_id"])
    ds = rd.from_pandas(df)
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("row_id").reset_index(drop=True)
    base_combo, _ = _codes(df)
    np.testing.assert_array_equal(out["a_b"].to_numpy(), base_combo)
    # scalar column also correct vs its broadcast run
    node2 = ["a"] >> ops.Categorify()
    wf2 = Workflow(node2 + ["row_id"])
    exp = wf2.fit(ds).transform(ds).to_pandas().sort_values("row_id")["a"].to_numpy()
    np.testing.assert_array_equal(out["a"].to_numpy(), exp)


def test_combo_distributed_list_member_guard(ray_session):
    import pyarrow as pa

    # arrow-backed input: a pandas block would erase the list type from the
    # sampled schema and the guard could not see it
    t = pa.table({"a": pa.array([["x"]]), "b": pa.array([1]), "row_id": pa.array([0])})
    node = [["a", "b"]] >> ops.Categorify(encode_type="combo", distributed=True)
    wf = Workflow(node + ["row_id"])
    with pytest.raises(NotImplementedError, match="list member"):
        wf.fit(rd.from_arrow(t))
