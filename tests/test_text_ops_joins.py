"""Workflow-DSL text ops (TextClean/PIIRedact/TokenCount/RepetitionRatio)
and JoinExternal semi/anti existence-filter modes."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_text_ops_in_workflow():
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["  Hello\tWORLD!! ", "a b a b a b", ""],
        }
    )
    node = (["text"] >> ops.TextClean() >> ops.TokenCount()) + (
        ["text"] >> ops.RepetitionRatio()
    ) + ["doc_id"]
    wf = Workflow(node)
    out = wf.fit(_ds(docs, 1)).transform(_ds(docs, 1)).to_pandas().sort_values("doc_id")
    # TextClean lowered/collapsed "hello world!!" -> tokens: hello, world, !, !
    assert out["text_tokens"].iloc[0] == 4
    assert abs(out["text_rep_ratio"].iloc[1] - 0.6) < 1e-12  # 2 distinct / 5 grams
    assert out["text_rep_ratio"].iloc[2] == 0.0


def test_pii_redact_op_in_workflow():
    docs = pd.DataFrame(
        {"doc_id": [0], "text": ["email bob@x.io ip 1.2.3.4 tel 555-123-4567"]}
    )
    wf = Workflow((["text"] >> ops.PIIRedact()) + ["doc_id"])
    out = wf.fit(_ds(docs, 1)).transform(_ds(docs, 1)).to_pandas()
    assert out["text"].iloc[0] == "email <EMAIL> ip <IP> tel <PHONE>"


def test_join_external_semi_anti():
    left = pd.DataFrame({"k": [1, 2, 2, 3, 4], "v": [10, 20, 21, 30, 40]})
    right = pd.DataFrame({"rk": [2, 3, 3, 99]})

    semi = Workflow(["k", "v"] >> ops.JoinExternal(right, on="k", on_ext="rk", how="semi"))
    out = semi.fit(_ds(left, 2)).transform(_ds(left, 2)).to_pandas().sort_values("v")
    # multiplicity preserved (2 appears twice), no right-side dup explosion
    assert list(out["k"]) == [2, 2, 3]

    anti = Workflow(["k", "v"] >> ops.JoinExternal(right, on="k", on_ext="rk", how="anti"))
    out = anti.fit(_ds(left, 2)).transform(_ds(left, 2)).to_pandas().sort_values("v")
    assert list(out["k"]) == [1, 4]


def test_join_external_rejects_unknown_how():
    import pytest

    with pytest.raises(ValueError):
        ops.JoinExternal(pd.DataFrame({"k": [1]}), on="k", how="outer")
