"""Fused single-scan fit: identical state to per-op fits, and the fusion
path actually engages / correctly opts out."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(n=4000, parts=6, seed=5):
    rng = np.random.RandomState(seed)
    tab = pa.table(
        {
            "conv_id": pa.array(rng.randint(0, 60, n), pa.int64()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int64)),
            "role": pa.array(rng.choice(["user", "assistant", "tool", None], n).tolist()),
            "tool": pa.array(rng.choice(["bash", "edit", "read"], n).tolist()),
            "text_len": pa.array(rng.randint(1, 500, n).astype("float64")),
        }
    )
    return rd.from_arrow(tab).repartition(parts)


def _flagship_wf():
    return Workflow(
        (["role", "tool"] >> ops.Categorify())
        + (["role"] >> ops.TargetEncoding("text_len", kfold=3, fold_on=["conv_id", "turn_idx"]))
        + (["text_len"] >> ops.LogOp() >> ops.Normalize() >> ops.Rename(postfix="_norm"))
        + ["conv_id", "turn_idx"]
    )


def test_fused_fit_engages_and_matches_unfused(monkeypatch):
    ds = _ds()
    calls = {"fused": 0}
    orig = Workflow._run_fused_fits

    def spy(self, d, planned):
        calls["fused"] += 1
        calls["plans"] = sum(len(p) for _, p, _ in planned)
        return orig(self, d, planned)

    monkeypatch.setattr(Workflow, "_run_fused_fits", spy)
    wf_fused = _flagship_wf().fit(ds)
    assert calls["fused"] == 1 and calls["plans"] == 3  # cat + te + normalize

    # unfused reference: force every op down its own fit()
    monkeypatch.setattr(
        Workflow, "_upstream_prep", lambda self, d, node: None
    )
    wf_ref = _flagship_wf().fit(ds)

    a = wf_fused.transform(ds).to_pandas().sort_values("turn_idx").reset_index(drop=True)
    b = wf_ref.transform(ds).to_pandas().sort_values("turn_idx").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_fused_fit_empty_input_matches_unfused_error_or_state():
    # zero-row input: both paths must behave identically (empty vocab, NaN
    # moments) — the fused reduce returns empty frames, not a crash
    tab = pa.table(
        {
            "role": pa.array([], pa.string()),
            "text_len": pa.array([], pa.float64()),
        }
    )
    ds = rd.from_arrow(tab)
    wf = Workflow(
        (["role"] >> ops.Categorify()) + (["text_len"] >> ops.Normalize())
    )
    wf.fit(ds)
    out = wf.transform(ds).to_pandas()
    assert len(out) == 0


def test_distributed_op_opts_out_of_fusion(monkeypatch):
    ds = _ds()
    seen = {"fused": 0}
    orig = Workflow._run_fused_fits

    def spy(self, d, planned):
        seen["fused"] += 1
        seen["ops"] = [type(n.op).__name__ for n, _, _ in planned]
        return orig(self, d, planned)

    monkeypatch.setattr(Workflow, "_run_fused_fits", spy)
    wf = Workflow(
        (["role"] >> ops.Categorify(distributed=True))
        + (["text_len"] >> ops.Normalize())
        + (["tool"] >> ops.Categorify())
    )
    wf.fit(ds)
    # distributed categorify must NOT be in the fused set; the other two fuse
    if seen["fused"]:
        assert "Categorify" not in [o for o in seen["ops"]] or seen["ops"].count("Categorify") == 1
    out = wf.transform(ds).to_pandas()
    assert {"role", "text_len", "tool"} <= set(out.columns)


def test_combo_categorify_falls_back():
    ds = _ds()
    wf = Workflow(
        ([["role", "tool"]] >> ops.Categorify(encode_type="combo"))
        + (["text_len"] >> ops.Normalize())
    )
    wf.fit(ds)
    out = wf.transform(ds).to_pandas()
    assert "role_tool" in out.columns
