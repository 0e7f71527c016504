"""DSIR importance resampling vs a hashlib/python reference."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from nvtabular_ray.functions.dsir import (
    default_log_ratios,
    dsir_resample,
    dsir_score,
    gumbel_from_ids,
)

DOCS = [
    (0, "the quick brown fox"),
    (1, "jumps over the lazy dog"),
    (2, ""),
    (3, "the the the"),
    (4, "pack my box with five dozen liquor jugs"),
    (5, "sphinx of black quartz judge my vow"),
    (6, "how vexingly quick daft zebras jump"),
    (7, "   "),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_logw(text: str, dim: int = 1024) -> float:
    lr = default_log_ratios(dim)
    return float(sum(lr[_h60(w) % dim] for w in text.split() if w))


def _ds(docs, parts=3):
    tab = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs]),
        }
    )
    return rd.from_arrow(tab).repartition(parts)


def test_dsir_score_matches_reference():
    out = dsir_score(_ds(DOCS)).to_pandas().sort_values("doc_id")
    want = [_ref_logw(t) for _, t in DOCS]
    np.testing.assert_allclose(out["dsir_logw"].to_numpy(), want, rtol=1e-12)
    assert out.loc[out.doc_id == 2, "dsir_logw"].item() == 0.0  # empty doc
    assert out.loc[out.doc_id == 7, "dsir_logw"].item() == 0.0  # whitespace doc


def test_gumbel_matches_spec():
    ids = pa.array([0, 1, 42], pa.int64())
    got = gumbel_from_ids(ids)
    for i, v in zip([0, 1, 42], got):
        u = ((_h60(str(i)) % (1 << 52)) + 0.5) / float(1 << 52)
        assert math.isclose(v, -math.log(-math.log(u)), rel_tol=1e-12)


def test_dsir_resample_is_gumbel_topk_and_partition_invariant():
    n = 4
    keys = {d: _ref_logw(t) + gumbel_from_ids(pa.array([d], pa.int64()))[0] for d, t in DOCS}
    want = sorted(sorted(keys), key=lambda d: -keys[d])[:n]
    for parts in (1, 3, 7):
        out = dsir_resample(_ds(DOCS, parts), n).to_pandas()
        assert sorted(out["doc_id"].tolist(), key=lambda d: -keys[d]) == want
        # restored logw matches the direct score to float addition noise
        for _, row in out.iterrows():
            ref = _ref_logw(dict(DOCS)[row.doc_id])
            assert math.isclose(row.dsir_logw, ref, rel_tol=1e-9, abs_tol=1e-12)
