"""Text analysis stages: stats, quality scoring, token counting, language ID,
document fingerprinting. (New scope beyond the reference — its only string
function is str.len, /root/reference/nvtabular/ops/data_stats.py:79.)

All stages are map_batches transforms; the language-ID stage is a callable
CLASS (actor pool) so its per-language resources build once per actor."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)  # BPE-ish: words + punct marks
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "sich"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"},
    "es": {"el", "la", "los", "las", "es", "no", "un", "una", "que", "por"},
}


def text_stats(ds, text_col: str = "text"):
    """Appends n_words (whitespace tokens) and n_chars_txt per row."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n_words = np.fromiter((len((s or "").split()) for s in texts), dtype=np.int64, count=len(texts))
        n_chars = np.fromiter((len(s or "") for s in texts), dtype=np.int64, count=len(texts))
        t = t.append_column("n_words", pa.array(n_words))
        t = t.append_column("n_chars_txt", pa.array(n_chars))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def token_count(ds, text_col: str = "text", out_col: str = "n_tokens"):
    """Whitespace + punctuation tokenization (BPE-ish regex) token counts."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = np.fromiter(
            (len(_TOKEN_RE.findall(s or "")) for s in texts), dtype=np.int64, count=len(texts)
        )
        return t.append_column(out_col, pa.array(n))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def quality_score(ds, text_col: str = "text"):
    """Heuristic document quality features: mean word length, punctuation
    ratio, stopword ratio (en), uppercase ratio, plus a composite score in
    [0,1] (monotone in 'looks like prose')."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        n = len(texts)
        mean_wl = np.zeros(n)
        punct_r = np.zeros(n)
        stop_r = np.zeros(n)
        upper_r = np.zeros(n)
        en_stop = _STOPWORDS["en"]
        for i, s in enumerate(texts):
            s = s or ""
            words = s.split()
            if words:
                mean_wl[i] = sum(len(w) for w in words) / len(words)
                stop_r[i] = sum(w.lower() in en_stop for w in words) / len(words)
            if s:
                punct_r[i] = len(_PUNCT_RE.findall(s)) / len(s)
                upper_r[i] = sum(c.isupper() for c in s) / len(s)
        score = (
            np.clip(1 - abs(mean_wl - 5) / 5, 0, 1) * 0.4
            + np.clip(stop_r * 4, 0, 1) * 0.3
            + np.clip(1 - punct_r * 5, 0, 1) * 0.2
            + np.clip(1 - upper_r * 5, 0, 1) * 0.1
        )
        for name, arr in [
            ("mean_word_len", mean_wl),
            ("punct_ratio", punct_r),
            ("stopword_ratio", stop_r),
            ("upper_ratio", upper_r),
            ("quality", score),
        ]:
            t = t.append_column(name, pa.array(arr))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class _LangId:
    """Actor-pool language detector: CJK char heuristic + per-language
    stopword hit-rate. Lexicons are built once per actor (__init__)."""

    def __init__(self):
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}
        self.cjk = re.compile(r"[一-鿿぀-ヿ]")
        self.word = re.compile(r"[a-zA-ZäöüßéèêàâçñáíóúÀ-ÿ]+")

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        preds = []
        for s in texts:
            s = s or ""
            if self.cjk.search(s):
                preds.append("zh")
                continue
            words = [w.lower() for w in self.word.findall(s)]
            if not words:
                preds.append("unknown")
                continue
            best, best_hits = "en", -1
            for lang, stop in self.stop.items():
                hits = sum(w in stop for w in words)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best if best_hits > 0 else "unknown")
        return t.append_column("lang_pred", pa.array(preds, pa.string()))


def detect_language(ds, concurrency: int = 4):
    return ds.map_batches(_LangId, batch_size=4096, batch_format="pyarrow", concurrency=concurrency)


def fingerprint(ds, text_col: str = "text", out_col: str = "fingerprint"):
    """60-bit rolling content fingerprint (winnowing-style: min of rolling
    8-gram hashes), robust to small local edits.

    PUBLIC spec (SQL-replicable — see functions/hashing.py md5_60):
    fingerprint(s) = min over i of md5_60(s[i:i+8]); md5_60(s) when len<8.
    All grams of the batch hash in one dictionary-encoded md5_60 call; the
    per-doc min is one ``np.minimum.reduceat`` over doc boundaries.
    """
    from nvtabular_ray.functions.hashing import md5_60

    def f(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        grams: list[list[str]] = []
        for s in texts:
            s = s or ""
            grams.append(
                [s] if len(s) < 8 else [s[j : j + 8] for j in range(len(s) - 7)]
            )
        lens = np.array([len(g) for g in grams], dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else np.empty(0, np.int64)
        flat = [g for doc in grams for g in doc]
        if flat:
            h = md5_60(np.array(flat, dtype=object))
            out = np.minimum.reduceat(h, starts).astype(np.int64)
        else:
            out = np.empty(0, dtype=np.int64)
        return t.append_column(out_col, pa.array(out))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
