"""Hashed linear classifier scoring (functions/classifier.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from nvtabular_ray.functions.classifier import classifier_score, default_weights
from nvtabular_ray.functions.hashing import md5_60


def _score_py(text, w, dim, bias):
    toks = [t for t in text.split() if t]
    if not toks:
        m = 0.0
    else:
        import hashlib

        buckets = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim for t in toks]
        m = float(np.mean([w[b] for b in buckets]))
    return 1.0 / (1.0 + np.exp(-(m + bias)))


def test_classifier_score_matches_python_spec(ray_session):
    dim, bias = 64, 0.25
    rng = np.random.default_rng(3)
    w = rng.normal(0, 0.5, dim)
    texts = [
        "the quick brown fox",
        "",
        "   ",
        "one",
        "repeated repeated repeated",
        "punct, and: stuff!  multiple   spaces",
        "unicode tökens ärger straße",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    out = (
        classifier_score(rd.from_pandas(df), dim=dim, weights=w, bias=bias, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = [_score_py(t, w, dim, bias) for t in texts]
    np.testing.assert_allclose(out["clf_score"].to_numpy(), expect, rtol=1e-12)
    # empty / whitespace-only docs score sigmoid(bias)
    sb = 1.0 / (1.0 + np.exp(-bias))
    assert out.loc[1, "clf_score"] == pytest.approx(sb)
    assert out.loc[2, "clf_score"] == pytest.approx(sb)


def test_default_weights_sql_formula():
    w = default_weights(1024)
    j = np.arange(1024)
    np.testing.assert_allclose(w, ((j * 2654435761) % 2048) / 1024.0 - 1.0)
    assert w.min() >= -1.0 and w.max() < 1.0


def test_classifier_score_bucket_spec(ray_session):
    """Bucket ids follow the public md5_60 spec exactly (what makes the
    driver SQL oracle possible)."""
    import pyarrow as pa

    toks = pa.array(["alpha", "beta", "gamma"])
    got = (md5_60(toks) % np.uint64(16)).astype(np.int64)
    import hashlib

    exp = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 16 for s in ["alpha", "beta", "gamma"]]
    np.testing.assert_array_equal(got, exp)


def _ppl_py(text, lp, dim):
    import hashlib

    toks = [t for t in (text or "").split() if t]
    if len(toks) < 2:
        return 1.0
    ls = [
        lp[int(hashlib.md5((a + " " + b).encode()).hexdigest()[:15], 16) % dim]
        for a, b in zip(toks, toks[1:])
    ]
    return float(np.exp(-np.mean(ls)))


def test_lm_perplexity_matches_python_spec(ray_session):
    from nvtabular_ray.functions.classifier import default_logprobs, lm_perplexity

    dim = 128
    lp = default_logprobs(dim)
    texts = [
        "the quick brown fox jumps",
        "",
        None,
        "one",
        "  padded   tokens  here ",
        "unicode tökens ärger straße wieder",
        "a b a b a b",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": pd.array(texts, dtype="string")})
    out = (
        lm_perplexity(rd.from_pandas(df), dim=dim, concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = [_ppl_py(t, lp, dim) for t in texts]
    np.testing.assert_allclose(out["ppl"].to_numpy(), expect, rtol=1e-12)
    # <2-token docs (empty, null, single) score exp(0) = 1
    for i in (1, 2, 3):
        assert out.loc[i, "ppl"] == 1.0


def test_default_logprobs_sql_formula():
    from nvtabular_ray.functions.classifier import default_logprobs

    lp = default_logprobs(2048)
    j = np.arange(2048)
    np.testing.assert_allclose(lp, -((j * 2654435761) % 2048) / 256.0)
    assert lp.max() <= 0.0 and lp.min() > -8.0
