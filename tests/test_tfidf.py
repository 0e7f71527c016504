"""TF-IDF distinctive-terms extraction."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray.functions.tfidf import build_vocabulary, distinctive_terms

DOCS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "cats and dogs and cats",
    "quantum flux capacitor the",
    None,
    "",
    "THE Cat! the cat?",
]


def _tok(s):
    return [w for w in re.split(r"[^a-z0-9]+", (s or "").lower()) if w]


def _local_oracle(docs, k, min_df, rank_by):
    df = Counter()
    tfs = []
    for d in docs:
        c = Counter(_tok(d))
        tfs.append(c)
        df.update(c.keys())
    n = len(docs)
    rows = []
    for i, c in enumerate(tfs):
        terms = [(t, tf, df[t]) for t, tf in c.items() if df[t] >= min_df]
        if rank_by == "score":
            terms.sort(key=lambda x: (-x[1] * math.log(n / x[2]), x[0]))
        else:
            terms.sort(key=lambda x: (-x[1], x[2], x[0]))
        for r, (t, tf, d_) in enumerate(terms[:k], 1):
            rows.append((i, t, tf, d_, r))
    return rows


def _ds(docs, blocks=3):
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    return rd.from_arrow(t).repartition(blocks)


@pytest.mark.parametrize("rank_by", ["count", "score"])
def test_distinctive_terms_matches_local_oracle(rank_by):
    out = distinctive_terms(_ds(DOCS), k=2, min_df=2, rank_by=rank_by).to_pandas()
    got = sorted(
        zip(out["doc_id"], out["term"], out["tf"], out["df"], out["rank"])
    )
    assert got == sorted(_local_oracle(DOCS, 2, 2, rank_by))
    if rank_by == "score":
        n = len(DOCS)
        exp = out["tf"] * np.log(n / out["df"])
        np.testing.assert_allclose(out["score"], exp, rtol=1e-12)


def test_vocabulary_min_df_and_cap():
    v = build_vocabulary(_ds(DOCS), min_df=3).to_pandas()
    assert set(v["term"]) == {"the", "cat", "sat", "on"} or "the" in set(v["term"])
    # every df honors the floor
    assert (v["df"] >= 3).all()
    capped = build_vocabulary(_ds(DOCS), min_df=1, max_vocab=3).to_pandas()
    assert len(capped) == 3
    # cap keeps the HIGHEST-df terms
    full = build_vocabulary(_ds(DOCS), min_df=1).to_pandas()
    assert set(capped["df"]) <= set(full["df"])
    assert capped["df"].min() >= full["df"].sort_values(ascending=False).iloc[3]


def test_block_layout_invariance():
    a = distinctive_terms(_ds(DOCS, blocks=1), k=3, min_df=2).to_pandas()
    b = distinctive_terms(_ds(DOCS, blocks=5), k=3, min_df=2).to_pandas()
    key = ["doc_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[["doc_id", "term", "tf", "df", "rank"]].equals(
        b[["doc_id", "term", "tf", "df", "rank"]]
    )


def test_docs_without_qualifying_terms_emit_no_rows():
    docs = ["xyzzy plugh", "aa bb", "aa bb"]
    out = distinctive_terms(_ds(docs), k=5, min_df=2).to_pandas()
    assert set(out["doc_id"]) == {1, 2}


def test_bucketed_vocab_merge_matches_driver_merge():
    a = build_vocabulary(_ds(DOCS), min_df=2).to_pandas()
    b = build_vocabulary(_ds(DOCS), min_df=2, merge="bucketed").to_pandas()
    ka = sorted(zip(a["term"], a["df"]))
    kb = sorted(zip(b["term"], b["df"]))
    assert ka == kb
    # doc count piggyback survives the bucketed floor
    _, n_a = build_vocabulary(_ds(DOCS), min_df=2, return_doc_count=True)
    _, n_b = build_vocabulary(_ds(DOCS), min_df=2, return_doc_count=True, merge="bucketed")
    assert n_a == n_b == len(DOCS)
