"""The PUBLIC md5_60 hash spec and its consumers: HashBucket/HashedCross,
fingerprint, MinHash and SimHash signatures — cross-checked against direct
hashlib/DuckDB computation — plus ANN reduced-probe recall bounds."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops
from nvtabular_ray.functions.hashing import md5_60


def _ds(df, blocks=2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def _ref_md5(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def test_md5_60_matches_hashlib():
    vals = ["", "a", "hello", "hello", "Ünïcødé ☃", "x" * 100]
    out = md5_60(np.array(vals, dtype=object))
    assert out.tolist() == [_ref_md5(s) for s in vals]


def test_md5_60_null_and_int():
    arr = pa.array(["a", None, "b"])
    out = md5_60(arr)
    assert out[1] == _ref_md5("")
    ints = pa.array([42, -7, 0], pa.int64())
    out = md5_60(ints)
    assert out.tolist() == [_ref_md5("42"), _ref_md5("-7"), _ref_md5("0")]


def test_hashbucket_md5_spec():
    df = pd.DataFrame({"k": ["apple", "pear", None, "apple"], "rid": [0, 1, 2, 3]})
    wf = Workflow((["k"] >> ops.HashBucket(16)) + ["rid"])
    out = wf.fit(_ds(df)).transform(_ds(df)).to_pandas().sort_values("rid")
    exp = [_ref_md5(s if s is not None else "") % 16 for s in df["k"]]
    assert out["k"].tolist() == exp


def test_hashed_cross_md5_spec():
    df = pd.DataFrame({"a": ["x", "y"], "b": [1, 2], "rid": [0, 1]})
    wf = Workflow(([["a", "b"]] >> ops.HashedCross(num_buckets=64)) + ["rid"])
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas().sort_values("rid")
    exp = [(_ref_md5("x") ^ _ref_md5("1")) % 64, (_ref_md5("y") ^ _ref_md5("2")) % 64]
    assert out["a_X_b"].tolist() == exp


def test_fingerprint_spec():
    from nvtabular_ray.functions.text import fingerprint

    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["short", "a much longer document body", ""]})
    out = fingerprint(_ds(df, 1)).to_pandas().sort_values("doc_id")

    def ref(s):
        if len(s) < 8:
            return _ref_md5(s)
        return min(_ref_md5(s[i : i + 8]) for i in range(len(s) - 7))

    assert out["fingerprint"].tolist() == [ref(s) for s in df["text"]]


def test_minhash_signature_spec():
    from nvtabular_ray.functions.dedup import minhash_perm_constants, minhash_signatures

    texts = ["hello world document", "hi"]
    a, b = minhash_perm_constants(16)
    sigs = minhash_signatures(texts, num_perm=16, shingle_k=5)

    def ref_sig(text, j):
        sh = [text] if len(text) < 5 else [text[i : i + 5] for i in range(len(text) - 4)]
        return min((int(a[j]) * _ref_md5(g) + int(b[j])) % (1 << 64) for g in sh)

    for j in (0, 7, 15):
        assert int(sigs[0, j]) == ref_sig(texts[0], j)
        assert int(sigs[1, j]) == ref_sig(texts[1], j)


def test_simhash_signature_spec():
    from nvtabular_ray.functions.dedup import simhash_signatures

    texts = ["The quick brown fox", "", "a a a b"]
    sigs = simhash_signatures(texts)

    def ref(text):
        toks = text.lower().split()
        if not toks:
            return 0
        hs = [_ref_md5(w) for w in toks]
        s = 0
        for j in range(60):
            votes = sum((h >> j) & 1 for h in hs)
            if 2 * votes > len(hs):
                s |= 1 << j
        return s

    assert [int(x) for x in sigs] == [ref(t) for t in texts]


# ----------------------------------------------------------- ANN recall --
@pytest.fixture()
def emb_ds():
    rng = np.random.RandomState(3)
    emb = rng.normal(size=(400, 32))
    df = pd.DataFrame({"vec_id": np.arange(400, dtype="int64"), "embedding": list(emb)})
    return _ds(df, 4), emb


def _recall(approx_ids, exact_ids):
    return len(set(approx_ids) & set(exact_ids)) / len(exact_ids)


def test_ann_reduced_probe_recall(emb_ds):
    from nvtabular_ray.functions.ann import brute_force_topk, ivf_topk, lsh_topk

    ds, emb = emb_ds
    q = emb[0]
    exact = brute_force_topk(ds, q, k=10).to_pandas()["vec_id"].tolist()
    lsh = lsh_topk(ds, q, k=10, nbits=4, probe_hamming=1).to_pandas()["vec_id"].tolist()
    ivf = ivf_topk(ds, q, k=10, nlist=8, nprobe=4).to_pandas()["vec_id"].tolist()
    assert _recall(lsh, exact) >= 0.3
    assert _recall(ivf, exact) >= 0.5
    # full probe must be exact
    lsh_full = lsh_topk(ds, q, k=10, nbits=4, probe_hamming=4).to_pandas()["vec_id"].tolist()
    ivf_full = ivf_topk(ds, q, k=10, nlist=8, nprobe=8).to_pandas()["vec_id"].tolist()
    assert lsh_full == exact
    assert ivf_full == exact


def test_minhash_distributed_propagation():
    """A 3-doc duplicate chain a~b, b~c (a!~c directly) must converge to one
    cluster via the distributed label-of-label round."""
    from nvtabular_ray.functions.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog " * 6
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype="int64"),
            "text": [base, base + "tail one", base + "tail one two", "completely different text here"],
        }
    )
    out = minhash_lsh_dedup(_ds(docs, 2)).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].iloc[0] == 0
    assert out["cluster_id"].iloc[1] == 0
    assert out["cluster_id"].iloc[3] == 3


def test_md5_60_char_shingles_matches_python_spec():
    """Vectorized shingle hasher == per-doc char-slicing spec on ASCII,
    unicode (multi-byte chars), NUL bytes, None, and sliced arrays."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from nvtabular_ray.functions.hashing import md5_60_char_shingles

    def oracle(texts, k):
        starts, hs, pos = [], [], 0
        for s in texts:
            s = s or ""
            grams = [s] if len(s) < k else [s[i : i + k] for i in range(len(s) - k + 1)]
            starts.append(pos)
            pos += len(grams)
            hs += [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        return np.array(starts, np.int64), np.array(hs, np.uint64)

    cases = [
        (["hello world", "", "ab", "xxxxxxxxxyyy", "hello world"], 5),
        (["abcdefgh", "short"], 8),
        (["日本語のテキストです長い文字列", "ascii only here", ""], 5),
        (["with\x00nul bytes inside here"], 5),
        ([None, "abc", None], 2),
    ]
    for texts, k in cases:
        s1, h1 = md5_60_char_shingles(pa.array(texts, pa.string()), k)
        s2, h2 = oracle(texts, k)
        assert np.array_equal(s1, s2) and np.array_equal(h1, h2), (texts, k)

    sliced = pa.array(["aaa bbb ccc", "dddddd", "ee"], pa.string()).slice(1, 2)
    s1, h1 = md5_60_char_shingles(sliced, 3)
    s2, h2 = oracle(["dddddd", "ee"], 3)
    assert np.array_equal(s1, s2) and np.array_equal(h1, h2)
