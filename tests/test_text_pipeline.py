"""Tests for the corpus-pipeline text operators added in round 2:
text_clean, pii_redact, repetition_ratio, semantic_dedup — plus regression
coverage that the Arrow-vectorized text kernels (text_stats, quality_score,
langid) keep the original per-row Python semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _ds(df, blocks=2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_text_clean():
    from nvtabular_ray.functions.text import text_clean

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "  Hello\tWorld \x07 ",
                "A\x00B\nC   D",
                "",
                "already clean",
            ],
        }
    )
    out = text_clean(_ds(docs, 2)).to_pandas().sort_values("doc_id")
    assert list(out["clean_text"]) == ["hello world", "a b c d", "", "already clean"]


def test_pii_redact():
    from nvtabular_ray.functions.text import pii_redact

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "mail me at john.doe+x@example.co.uk or visit 10.0.0.1 now",
                "call 555-123-4567 or +1 555 222 3333 tomorrow",
                "nothing sensitive here",
            ],
        }
    )
    out = pii_redact(_ds(docs, 2)).to_pandas().sort_values("doc_id")
    assert out["redacted"].iloc[0] == "mail me at <EMAIL> or visit <IP> now"
    assert "<PHONE>" in out["redacted"].iloc[1]
    assert "555-123-4567" not in out["redacted"].iloc[1]
    assert out["n_pii"].iloc[0] == 2
    assert out["n_pii"].iloc[2] == 0
    assert out["redacted"].iloc[2] == "nothing sensitive here"


def test_repetition_ratio_exact():
    from nvtabular_ray.functions.text import repetition_ratio

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b a b a b",  # grams: ab,ba,ab,ba,ab -> 2 distinct / 5
                "one two three four",  # all distinct -> 0
                "solo",  # < 2 words -> 0
                "",
            ],
        }
    )
    out = repetition_ratio(_ds(docs, 2), threshold=0.3).to_pandas().sort_values("doc_id")

    def oracle(s):
        w = s.lower().split()
        grams = [(w[i], w[i + 1]) for i in range(len(w) - 1)]
        return 0.0 if not grams else 1.0 - len(set(grams)) / len(grams)

    for i, s in enumerate(docs["text"]):
        assert abs(out["dup_gram_ratio"].iloc[i] - oracle(s)) < 1e-12, (i, s)
    assert bool(out["is_repetitive"].iloc[0]) is True  # 0.6 > 0.3
    assert bool(out["is_repetitive"].iloc[1]) is False


def test_repetition_ratio_batch_boundaries():
    """Grams must never span documents — adjacent docs sharing words."""
    from nvtabular_ray.functions.text import repetition_ratio

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["x y", "y x"]})
    out = repetition_ratio(_ds(docs, 1)).to_pandas().sort_values("doc_id")
    assert list(out["dup_gram_ratio"]) == [0.0, 0.0]


def test_semantic_dedup_clusters():
    from nvtabular_ray.functions.dedup import semantic_dedup

    rng = np.random.RandomState(11)
    base = rng.normal(size=(30, 16))
    emb = np.vstack([base, base[:6]])  # ids 30..35 duplicate ids 0..5
    df = pd.DataFrame(
        {"vec_id": np.arange(len(emb), dtype="int64"), "embedding": list(emb)}
    )
    out = semantic_dedup(_ds(df, 3), threshold=0.99, nlist=4, nprobe=2).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 36
    dup = out[out["vec_id"] >= 30]
    assert list(dup["cluster_id"]) == [0, 1, 2, 3, 4, 5]
    # non-duplicates keep their own id
    solo = out[(out["vec_id"] >= 6) & (out["vec_id"] < 30)]
    assert (solo["cluster_id"] == solo["vec_id"]).all()


def test_vectorized_text_kernels_match_python():
    """The Arrow-kernel rewrites must reproduce the original per-row Python
    semantics on ASCII text (the engine's public spec)."""
    from nvtabular_ray.functions.text import detect_language, quality_score, text_stats

    texts = [
        "The quick brown fox and the lazy dog, it is that good for a test.",
        "der hund und die katze das ist nicht ein zoo",
        "UPPER!!! CASE??? ###",
        "",
        "   ",
        "le chat est la et il ne dort pas un peu que des",
        "word",
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    qs = quality_score(_ds(docs, 2)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ts = text_stats(_ds(docs, 2)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, s in enumerate(texts):
        words = s.split()
        assert ts["n_words"].iloc[i] == len(words)
        assert ts["n_chars_txt"].iloc[i] == len(s)
        if words:
            exp_mwl = sum(len(w) for w in words) / len(words)
            assert abs(qs["mean_word_len"].iloc[i] - exp_mwl) < 1e-12
            en = {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}
            exp_stop = sum(w.lower() in en for w in words) / len(words)
            assert abs(qs["stopword_ratio"].iloc[i] - exp_stop) < 1e-12
        else:
            assert qs["mean_word_len"].iloc[i] == 0.0

    lid = detect_language(_ds(docs, 2), concurrency=1).to_pandas()
    lid = lid.sort_values("doc_id").reset_index(drop=True)
    assert lid["lang_pred"].iloc[0] == "en"
    assert lid["lang_pred"].iloc[1] == "de"
    assert lid["lang_pred"].iloc[5] == "fr"
    assert lid["lang_pred"].iloc[3] == "unknown"
    assert lid["lang_pred"].iloc[4] == "unknown"


def test_chunk_documents_spec():
    """Chunks reconstruct the document (minus overlap regions) and follow
    the (size, overlap) stride spec exactly, incl. unicode fallback."""
    from nvtabular_ray.functions.text import chunk_documents

    texts = ["a" * 1300, "", "short", "b" * 500, "c" * 501, "日本語" * 300]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = (
        chunk_documents(_ds(df, 2), chunk_size=500, overlap=50)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    def oracle(s, size=500, ov=50):
        stride = size - ov
        m = 1 if len(s) <= size else -(-(len(s) - size) // stride) + 1
        return [s[c * stride : c * stride + size] for c in range(m)]

    for d, s in enumerate(texts):
        assert out[out.doc_id == d]["chunk_text"].tolist() == oracle(s), d


def test_decontaminate_flags_ngram_overlap(ray_session):
    from nvtabular_ray.functions.decontaminate import decontaminate

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "text": [
                # two benchmark 3-grams: "the quick brown", "quick brown fox"
                "watch the quick brown fox run away fast",
                # three: "jumps over the", "over the lazy", "the lazy dog"
                "it jumps over the lazy dog indeed",
                # no shared 3-gram (words shared but never 3 in a row)
                "quick dog fox brown lazy the jumps",
                # case-insensitive: "The Quick Brown" + "Quick Brown fox"
                "The Quick Brown fox again",
                # short doc (< n words): zero grams, never contaminated
                "quick brown",
            ],
        }
    )
    out = (
        decontaminate(_ds(docs), bench, n=3, min_hits=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_gram_hits"].tolist() == [2, 3, 0, 2, 0]
    assert out["contaminated"].tolist() == [1, 1, 0, 1, 0]
    # min_hits gates the flag
    out2 = decontaminate(_ds(docs), bench, n=3, min_hits=3).to_pandas()
    assert out2.set_index("doc_id")["contaminated"].to_dict() == {0: 0, 1: 1, 2: 0, 3: 0, 4: 0}


def test_decontaminate_remove_mode_keeps_all_columns(ray_session):
    from nvtabular_ray.functions.decontaminate import decontaminate

    bench = ["alpha beta gamma delta"]
    docs = pd.DataFrame(
        {
            "doc_id": [10, 11],
            "text": ["prefix alpha beta gamma suffix", "nothing shared here at all"],
            "extra": ["a", "b"],
        }
    )
    out = decontaminate(_ds(docs, blocks=1), bench, n=3, mode="remove").to_pandas()
    assert out["doc_id"].tolist() == [11]
    assert list(out.columns) == ["doc_id", "text", "extra"]


def test_decontaminate_benchmark_as_dataset(ray_session):
    from nvtabular_ray.functions.decontaminate import decontaminate

    bench_df = pd.DataFrame({"text": ["one two three four five"]})
    docs = pd.DataFrame({"doc_id": [0], "text": ["zero one two three four five six"]})
    out = decontaminate(_ds(docs, blocks=1), _ds(bench_df, blocks=1), n=5).to_pandas()
    # doc contains "one two three four five" = 1 five-gram hit
    assert out["n_gram_hits"].tolist() == [1]


def test_line_dedup_exact_vs_python_oracle():
    from nvtabular_ray.functions.dedup import line_dedup

    # boilerplate "subscribe now to our newsletter" repeats across docs;
    # short lines ("", "- item") are never removed; doc 4 loses every line
    docs = {
        0: "unique opening line here\nsubscribe now to our newsletter\n\n- item",
        1: "subscribe now to our newsletter\nanother unique body line",
        2: "totally distinct content\n\n- item",
        3: "",  # single empty line, always kept
        4: "subscribe now to our newsletter",  # all lines removed -> doc dropped
        5: "héllo unicode línea repeated\nx",
        6: "héllo unicode línea repeated\ny",
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (
        line_dedup(_ds(df, blocks=3), min_dup=2, min_line_chars=10)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # pure-python oracle
    from collections import Counter

    counts = Counter(
        ln for s in docs.values() for ln in s.split("\n") if len(ln) >= 10
    )
    expect = {}
    for i, s in docs.items():
        kept = [ln for ln in s.split("\n") if len(ln) < 10 or counts[ln] < 2]
        if kept:
            expect[i] = ("\n".join(kept), len(s.split("\n")) - len(kept))
    assert out["doc_id"].tolist() == sorted(expect)
    for _, r in out.iterrows():
        assert (r["text"], r["n_removed"]) == expect[r["doc_id"]], r["doc_id"]
    assert 4 not in out["doc_id"].tolist()
    assert out["n_removed"].dtype == np.int32


def test_dup_span_fraction_vs_python_oracle():
    """dup_span_fraction == the whole-corpus Counter spec: per doc, the
    fraction of word-3gram OCCURRENCES whose gram appears in >= 2 distinct
    docs — across blocks (grams of one doc land in many bucket tasks)."""
    from nvtabular_ray.functions.dedup import dup_span_fraction, word_ngrams

    docs = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox sat still",  # shares "the quick brown" etc.
        2: "completely different words entirely here now",
        3: "short one",  # < 3 words -> whole-doc gram, unique
        4: "short one",  # same whole-doc gram -> 100% duplicated
        5: "",  # empty -> whole-doc gram "" shared with nobody
        6: "the quick brown fox jumps over the lazy dog",  # exact dup of 0
    }
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (
        dup_span_fraction(_ds(df, blocks=4), "text", "doc_id", n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # pure-python oracle over the SAME gram spec
    grams = {i: list(word_ngrams([s], 3)[0]) for i, s in docs.items()}
    from collections import defaultdict

    docs_per_gram = defaultdict(set)
    for i, gs in grams.items():
        for g in gs:
            docs_per_gram[g].add(i)
    expect = {
        i: (
            sum(1 for g in gs if len(docs_per_gram[g]) >= 2) / len(gs),
            len(gs),
        )
        for i, gs in grams.items()
    }
    assert out["doc_id"].tolist() == sorted(expect)
    for _, r in out.iterrows():
        e_frac, e_n = expect[r["doc_id"]]
        assert r["dup_frac"] == e_frac, r["doc_id"]
        assert r["n_spans"] == e_n
    # pinned spot values: exact dups fully flagged, unique docs at 0
    by_id = out.set_index("doc_id")
    assert by_id.loc[0, "dup_frac"] == 1.0 and by_id.loc[6, "dup_frac"] == 1.0
    assert by_id.loc[2, "dup_frac"] == 0.0 and by_id.loc[5, "dup_frac"] == 0.0
    assert by_id.loc[3, "dup_frac"] == 1.0 and by_id.loc[4, "dup_frac"] == 1.0
    assert out["n_spans"].dtype == np.int64


def test_gopher_rules_per_rule():
    """Each Gopher rule rejects exactly the doc crafted to violate it; the
    per-rule feature columns carry hand-computed values."""
    from nvtabular_ray.functions.text import gopher_rules

    good = "the quick brown fox jumps over of lazy dog nearby " * 2  # 20 words
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "text": [
                good.strip(),
                "too short now",  # word-count floor
                "\n".join(["- item one two aaa the of"] * 5),  # bullets
                "the of " + "# " * 18,  # symbol ratio 18/20 with 20 words
                "the of one two three...\nfour five six seven eight...",  # ellipsis lines
                "the of " + "123 456 " * 9,  # alpha ratio 2/20
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # no stopwords
            ],
        }
    )
    out = (
        gopher_rules(
            _ds(docs, 2),
            min_words=5,
            min_stop_hits=2,
            max_bullet_ratio=0.9,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_words"].tolist() == [20, 3, 35, 20, 10, 20, 10]
    assert out["gopher_keep"].tolist() == [1, 0, 0, 0, 0, 0, 0]
    # doc 0: mean word length = 80 chars / 20 words
    assert abs(out.loc[0, "mean_word_len"] - 80 / 20) < 1e-12
    assert out.loc[0, "n_stop_hits"] == 2 and out.loc[0, "alpha_ratio"] == 1.0
    # doc 2: every line bullet-started
    assert out.loc[2, "bullet_ratio"] == 1.0
    # doc 3: 18 '#' over 20 words
    assert abs(out.loc[3, "symbol_ratio"] - 18 / 20) < 1e-12
    # doc 4: both lines ellipsis-terminated
    assert out.loc[4, "ellipsis_ratio"] == 1.0
    # doc 5: only 'the'/'of' contain letters
    assert abs(out.loc[5, "alpha_ratio"] - 2 / 20) < 1e-12
    # doc 6: stopword floor is the only failing rule
    assert out.loc[6, "n_stop_hits"] == 0

    kept = (
        gopher_rules(_ds(docs, 2), min_words=5, min_stop_hits=2, mode="filter")
        .to_pandas()
    )
    assert kept["doc_id"].tolist() == [0]
    assert list(kept.columns) == ["doc_id", "text"]


def test_split_sentences_semantics(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray.functions.text import split_sentences

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "Hello world. How are you?  Ok!x",
                "no enders here",
                None,
                "A.  Tiny?Long sentence here.   ",
            ],
        }
    )
    out = (
        split_sentences(rd.from_arrow(t), min_chars=2)
        .to_pandas()
        .sort_values(["doc_id", "sent_idx"])
        .reset_index(drop=True)
    )
    got = list(zip(out["doc_id"], out["sent_idx"], out["sentence"]))
    assert got == [
        (1, 1, "Hello world"),
        (1, 2, "How are you"),
        (1, 3, "Ok"),      # "!x": zero-space ender still splits; "x" dropped
        (2, 1, "no enders here"),
        # doc 3 (null text) emits no rows
        (4, 2, "Tiny"),    # "A" (ord 1) dropped by min_chars — ordinals stable
        (4, 3, "Long sentence here"),
    ]
