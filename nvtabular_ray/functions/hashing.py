"""Stable, vectorized 64-bit hashing.

The reference warns that its GPU/CPU hash functions diverge
(/root/reference/nvtabular/ops/categorify.py:332-338). We instead fix ONE
internal hash everywhere — polars' seeded row hash (xxhash-family, zero-copy
from Arrow, ~10-20x faster than pandas' SipHash on strings and multi-column
rows), with pandas SipHash-1-3 as the import fallback. Deterministic across
processes and runs within one environment, which makes hash-derived behavior
(OOV buckets, fold assignment, shuffle bucketing, dedup bands)
partition-count-invariant and reproducible — a requirement the reference's
partition-local RNG fold assignment does not meet (SURVEY.md §7.4).

For hashes a user-facing feature EXPOSES (HashBucket, HashedCross,
fingerprint, MinHash/SimHash signatures), use ``md5_60`` below instead: a
public spec any SQL engine can replicate exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Fixed key/seed => deterministic across runs/machines. 16 ASCII bytes.
_HASH_KEY = "nvtabular_ray_00"
_PL_SEED = 0x5EED_042

try:  # module-level decision so driver and every worker agree
    import polars as _pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover
    _pl = None
    _HAVE_POLARS = False


def _to_series(values) -> pd.Series:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_pandas()
    if not isinstance(values, pd.Series):
        values = pd.Series(values)
    return values


def hash64(values) -> np.ndarray:
    """Hash a column (pa.Array / ChunkedArray / np.ndarray / pd.Series) to
    uint64 — the engine-internal hash (see module docstring).

    Nulls hash to a fixed value; callers that need null-awareness should
    mask nulls themselves.
    """
    if _HAVE_POLARS:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            s = _pl.from_arrow(values)  # zero-copy
        elif isinstance(values, pd.Series):
            s = _pl.from_pandas(values)
        else:
            s = _pl.Series(np.asarray(values))
        return s.hash(seed=_PL_SEED).to_numpy().astype(np.uint64)
    s = _to_series(values)
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()


# SplitMix64 finalizer constants (Steele, Lea & Flood, "Fast Splittable
# Pseudorandom Number Generators", OOPSLA 2014) — a published, frozen spec.
_SM_G = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_SM_NULL = np.uint64(0xA5A5A5A55A5A5A5A)  # fixed pre-mix word for nulls


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + _SM_G
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def _stable_words(arr) -> "np.ndarray | None":
    """Map a NUMERIC/temporal/bool Arrow or numpy column to canonical uint64
    words (None => type not eligible, caller falls back to SipHash).
    Canonicalization: ints/bools sign-wrap to uint64; floats widen to
    float64, -0.0 -> +0.0 and every NaN -> one bit pattern; timestamps/dates
    use their integer representation. Nulls -> a fixed word."""
    import pyarrow.compute as pc

    mask = None
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        at = arr.type
        ok = (
            pa.types.is_integer(at)
            or pa.types.is_floating(at)
            or pa.types.is_boolean(at)
            or pa.types.is_temporal(at)
        )
        if not ok:
            return None
        if pa.types.is_temporal(at):
            try:
                arr = arr.view(pa.int64()) if at.bit_width == 64 else arr.cast(pa.int64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return None
        if pa.types.is_boolean(arr.type):
            # fill_null(0) on a boolean array raises ArrowInvalid; widen first
            arr = arr.cast(pa.int8())
        if arr.null_count:
            mask = np.asarray(pc.is_null(arr))
            arr = arr.fill_null(0)
        np_arr = arr.to_numpy(zero_copy_only=False)
    else:
        np_arr = np.asarray(arr)
        if np_arr.dtype == object:
            return None
    if np_arr.dtype.kind == "M" or np_arr.dtype.kind == "m":
        np_arr = np_arr.view(np.int64)
    if np_arr.dtype.kind in "iub":
        w = np_arr.astype(np.uint64)
    elif np_arr.dtype.kind == "f":
        f = np_arr.astype(np.float64)
        f = np.where(f == 0.0, 0.0, f)  # -0.0 == 0.0 -> +0.0
        w = f.view(np.uint64).copy()
        w[np.isnan(f)] = np.uint64(0x7FF8000000000000)
    else:
        return None
    if mask is not None:
        w[mask] = _SM_NULL
    return w


def hash64_stable(values) -> np.ndarray:
    """Version-stable uint64 hash for anything that feeds PERSISTED or
    SERVING state (Categorify OOV bucket codes, TargetEncoding fold
    assignment). Numeric/bool/temporal columns use OUR OWN SplitMix64-based
    spec (pure uint64 arithmetic — stable by construction across numpy,
    pandas and polars versions, and ~15x faster than pandas' SipHash);
    string/object columns fall back to pandas' SipHash-1-3 with a fixed key
    (a published frozen spec). ``hash64`` above (polars xxhash) is faster on
    strings but polars does not guarantee cross-version stability, so a
    saved workflow served in another environment would silently re-bucket.
    Use ``hash64`` ONLY for within-run shuffle/exchange keys."""
    if isinstance(values, (pa.Array, pa.ChunkedArray, np.ndarray)):
        w = _stable_words(values)
        if w is not None:
            return _splitmix64(w)
    s = _to_series(values)
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy()


def hash64_columns_stable(table, columns: list[str]) -> np.ndarray:
    """Row-wise version-stable uint64 hash over several columns (see
    ``hash64_stable``), order-sensitive. Each column hashes INDEPENDENTLY
    (SplitMix64 for numeric/bool/temporal, pandas SipHash for strings) and
    the per-column hashes combine with the boost-style mixer
    ``h ^= mix(c) + G + (h<<6) + (h>>2)``.

    Never hash a multi-column pandas FRAME here: ``to_pandas()`` converts a
    nullable int64 column to float64 only in batches that contain a null,
    so identical rows would hash differently depending on batch composition
    — silent re-bucketing of persisted folds/OOV codes."""
    if not columns:
        raise ValueError("hash64_columns_stable needs at least one column")
    if isinstance(table, pa.Table):
        cols = [table.column(c) for c in columns]
    else:  # pandas frame
        cols = [pa.Array.from_pandas(table[c]) for c in columns]
    hs = []
    for c in cols:
        w = _stable_words(c)
        hs.append(_splitmix64(w) if w is not None else hash64_stable(c))
    h = hs[0]
    with np.errstate(over="ignore"):
        for x in hs[1:]:
            h = h ^ (x + _SM_G + (h << np.uint64(6)) + (h >> np.uint64(2)))
    return h


def md5_60(values) -> np.ndarray:
    """PUBLIC 60-bit hash spec, exactly replicable in SQL engines:

        h(x) = int(md5(utf8(x)).hexdigest()[:15], 16)        (null -> h(""))

    DuckDB equivalent: ``('0x' || substr(md5(COALESCE(CAST(x AS VARCHAR), '')),
    1, 15))::BIGINT`` — this is what makes HashBucket / HashedCross /
    fingerprint / MinHash / SimHash outputs oracle-checkable by an
    independent SQL engine (60 bits so the value stays in a signed BIGINT).

    Vectorized by per-batch dictionary encoding: md5 runs once per DISTINCT
    value in the batch (the common case for categorical columns); an
    all-unique column degrades to ~1µs/row — prefer ``hash64`` (SipHash,
    ~10x faster, not SQL-replicable) where a public spec isn't needed.
    Accepts pa.Array/ChunkedArray (string or castable-to-string), numpy
    object arrays, or lists of str. Returns uint64 (values < 2^60).
    """
    import hashlib

    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        if not (pa.types.is_string(values.type) or pa.types.is_large_string(values.type)):
            import pyarrow.compute as pc

            values = pc.cast(values, pa.string())
        arr = values.to_numpy(zero_copy_only=False)
    else:
        arr = np.asarray(values, dtype=object)
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    # nulls hash as empty string (SQL COALESCE(x, ''))
    arr = np.array([s if s is not None else "" for s in arr], dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    hs = np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) for s in uniq),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hs[inv]


def hash64_columns(table, columns: list[str]) -> np.ndarray:
    """Combined row-wise uint64 hash of several columns of a pa.Table/DataFrame
    (order-sensitive). Polars ``hash_rows`` (zero-copy from Arrow) with the
    pandas multi-column SipHash mix as fallback."""
    if _HAVE_POLARS:
        if isinstance(table, pa.Table):
            df = _pl.from_arrow(table.select(columns))
        else:
            df = _pl.from_pandas(table[columns])
        return df.hash_rows(seed=_PL_SEED).to_numpy().astype(np.uint64)
    if isinstance(table, pa.Table):
        df = table.select(columns).to_pandas()
    else:
        df = table[columns]
    return pd.util.hash_pandas_object(df, index=False, hash_key=_HASH_KEY).to_numpy()


def md5_60_char_shingles(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-document rolling k-char-shingle md5_60 hashes, batch-vectorized.

    Returns ``(starts, h)``: ``h`` is the flat uint64 hash array of every
    shingle of every doc in order, ``starts[i]`` the offset of doc i's first
    shingle (docs shorter than k chars contribute ONE shingle — the whole
    string — matching the public spec used by fingerprint/MinHash oracles).

    Fast path (pure-ASCII, NUL-free batch): shingles come from ONE numpy
    sliding-window view over the flat UTF-8 buffer and dedup via np.unique
    on fixed-width |S{k} bytes — md5 runs once per DISTINCT shingle and no
    per-document Python executes. Mixed-unicode (char != byte) or
    NUL-containing batches fall back to per-doc slicing (np.bytes_ would
    silently strip trailing NULs; multi-byte chars break byte windows).
    """
    import hashlib

    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if not isinstance(texts, pa.Array):
        texts = pa.array(["" if t is None else t for t in texts], pa.string())
    texts = pc.fill_null(texts, "")
    n = len(texts)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)

    off_dtype = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    off = np.frombuffer(texts.buffers()[1], dtype=off_dtype)[
        texts.offset : texts.offset + n + 1
    ].astype(np.int64)
    flat = np.frombuffer(texts.buffers()[2], dtype=np.uint8)[off[0] : off[-1]]
    off = off - off[0]
    lens = np.diff(off)
    n_sh = np.where(lens >= k, lens - k + 1, 1).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])

    ascii_ok = bool(pc.all(pc.string_is_ascii(texts)).as_py() if n else True)
    if ascii_ok and not (len(flat) and (flat == 0).any()):
        long_mask = lens >= k
        # positions of every full window, doc-boundary aware (vectorized)
        w_starts = off[:-1][long_mask]
        w_counts = (lens[long_mask] - k + 1)
        cum = np.concatenate([[0], np.cumsum(w_counts)])
        pos = (
            np.arange(cum[-1], dtype=np.int64)
            - np.repeat(cum[:-1], w_counts)
            + np.repeat(w_starts, w_counts)
        )
        if len(flat) >= k:
            wins = np.lib.stride_tricks.sliding_window_view(flat, k)[pos]
        else:
            wins = np.empty((0, k), np.uint8)
        grams_long = np.ascontiguousarray(wins).view(f"|S{k}").ravel()
        # short docs: the whole string is the single shingle
        short_idx = np.flatnonzero(~long_mask)
        uniq, inv = np.unique(grams_long, return_inverse=True)
        hs = np.fromiter(
            (int(hashlib.md5(g).hexdigest()[:15], 16) for g in uniq.tolist()),
            dtype=np.uint64,
            count=len(uniq),
        )
        h = np.empty(cum[-1] + len(short_idx), dtype=np.uint64)
        # scatter long-doc hashes into their flat slots
        long_slots = (
            np.arange(cum[-1], dtype=np.int64)
            - np.repeat(cum[:-1], w_counts)
            + np.repeat(starts[long_mask], w_counts)
        )
        h_all = np.empty(int(n_sh.sum()), dtype=np.uint64)
        h_all[long_slots] = hs[inv]
        if len(short_idx):
            sb = [
                flat[off[i] : off[i + 1]].tobytes() for i in short_idx
            ]  # true bytes, NUL-free by branch guard
            h_all[starts[short_idx]] = np.fromiter(
                (int(hashlib.md5(b).hexdigest()[:15], 16) for b in sb),
                dtype=np.uint64,
                count=len(sb),
            )
        return starts, h_all

    # unicode/NUL fallback: per-doc CHAR slicing (exact spec semantics —
    # note starts must use char counts here, not the byte-length n_sh above)
    pys = texts.to_pylist()
    grams: list[list[str]] = [
        [s] if len(s) < k else [s[i : i + k] for i in range(len(s) - k + 1)]
        for s in (t or "" for t in pys)
    ]
    n_sh = np.array([len(g) for g in grams], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
    flat_grams = np.array([g for doc in grams for g in doc], dtype=object)
    return starts, md5_60(flat_grams)
