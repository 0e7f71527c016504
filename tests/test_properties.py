"""Property-based tests (hypothesis) for core op semantics — beyond the
reference's test strategy, which has no randomized testing (SURVEY.md §5).
Each property runs the REAL Ray pipeline against a pandas oracle on
adversarially-generated small frames."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nvtabular_ray import Workflow, ops

_SETTINGS = dict(max_examples=10, deadline=None)


def _ds(df, parts=3):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)


@st.composite
def cat_frames(draw):
    n = draw(st.integers(5, 60))
    vocab = draw(st.lists(st.text(min_size=0, max_size=4), min_size=1, max_size=8, unique=True))
    vals = draw(
        st.lists(st.one_of(st.sampled_from(vocab), st.none()), min_size=n, max_size=n)
    )
    return pd.DataFrame({"i": np.arange(n, dtype="int64"), "c": pd.array(vals, dtype="object")})


@settings(**_SETTINGS)
@given(cat_frames())
def test_categorify_code_properties(df):
    ds = _ds(df)
    wf = Workflow((["c"] >> ops.Categorify()) + ["i"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("i").reset_index(drop=True)
    codes = out["c"].to_numpy()
    vals = df["c"]
    # oracle uses PYTHON sets/dicts, not pandas groupby/nunique: pandas'
    # StringHashTable merges strings differing only past an embedded NUL —
    # the exact bug this property caught in (and which was fixed out of)
    # grouped_reduce; the oracle must not share it
    nonnull = [(v, c) for v, c in zip(vals.tolist(), codes) if v is not None]
    n_distinct = len({v for v, _ in nonnull})
    # nulls -> 1; observed values -> [3, 3+n_distinct) (base=3: pad,null,oov)
    assert (codes[vals.isna().to_numpy()] == 1).all()
    seen = np.array([c for _, c in nonnull])
    assert ((seen >= 3) & (seen < 3 + n_distinct)).all()
    # bijection: same value <-> same code
    v2c: dict = {}
    c2v: dict = {}
    for v, c in nonnull:
        assert v2c.setdefault(v, c) == c
        assert c2v.setdefault(c, v) == v
    # frequency order: strictly more frequent value gets a smaller code
    from collections import Counter

    counts = Counter(v for v, _ in nonnull)
    items = sorted(counts.items(), key=lambda kv: -kv[1])
    for a in range(len(items)):
        for b in range(a + 1, len(items)):
            if items[a][1] > items[b][1]:
                assert v2c[items[a][0]] < v2c[items[b][0]]


@st.composite
def lag_frames(draw):
    n = draw(st.integers(4, 50))
    ent = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    vals = draw(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32), min_size=n, max_size=n
        )
    )
    return pd.DataFrame(
        {
            "i": np.arange(n, dtype="int64"),
            "e": np.array(ent, dtype="int64"),
            "t": np.arange(n, dtype="int64"),
            "v": np.array(vals, dtype="float64"),
        }
    )


@settings(**_SETTINGS)
@given(lag_frames())
def test_difference_lag_matches_pandas(df):
    ds = _ds(df)
    node = ["v"] >> ops.DifferenceLag(partition_cols="e", shift=[1], sort_cols=["t"])
    wf = Workflow(node + ["i"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("i").reset_index(drop=True)
    oracle = (
        df.sort_values(["e", "t"]).groupby("e")["v"].diff().astype("float32")
    )
    oracle = oracle.reindex(df.sort_values(["e", "t"]).index).sort_index()
    got = out["v_difference_lag_1"].astype("float32")
    np.testing.assert_allclose(
        got.to_numpy(), oracle.to_numpy(), rtol=1e-6, equal_nan=True
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(-1e4, 1e4, allow_nan=False, width=32), min_size=3, max_size=80
    ).filter(lambda v: np.std(v) > 1e-6)
)
def test_normalize_zscore_property(vals):
    df = pd.DataFrame({"i": np.arange(len(vals), dtype="int64"), "x": np.array(vals, "float64")})
    ds = _ds(df)
    wf = Workflow((["x"] >> ops.Normalize()) + ["i"])
    out = wf.fit(ds).transform(ds).to_pandas().sort_values("i")
    x = out["x"].to_numpy()
    assert abs(x.mean()) < 1e-6
    assert abs(x.std(ddof=1) - 1.0) < 1e-6


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 2), min_size=4, max_size=30),
    st.lists(st.integers(0, 2000), min_size=4, max_size=30),
    st.integers(2, 500),
)
def test_sessionize_gap_invariants(ents, gaps, gap):
    n = min(len(ents), len(gaps))
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype="int64"),
            "e": np.array(ents[:n], dtype="int64"),
            "ts": pd.to_datetime(np.cumsum(np.array(gaps[:n], dtype="int64")), unit="s"),
        }
    )
    from nvtabular_ray.pipelines.temporal import sessionize

    out = (
        sessionize(_ds(df), "e", "ts", gap=gap)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    merged = df.merge(out[["i", "session_id"]], on="i")
    for _, g in merged.sort_values("ts").groupby("e"):
        sid = g["session_id"].to_numpy()
        dt = g["ts"].diff().dt.total_seconds().to_numpy()
        # session ids start at 0, increment by exactly 1 on gaps > threshold
        assert sid[0] == 0
        for j in range(1, len(g)):
            assert sid[j] - sid[j - 1] == (1 if dt[j] > gap else 0)


@settings(**_SETTINGS)
@given(st.integers(0, 10_000))
def test_target_encoding_out_of_fold_leakage(seed):
    """Leakage property: a row's own target must not influence its TE value
    through the fold statistics. The global smoothing prior is pinned with
    ``target_mean`` (otherwise the row legitimately moves the global mean —
    reference semantics, target_encoding.py:132). With the prior fixed,
    perturbing ONE row's target must leave that row's own out-of-fold
    encoding unchanged."""
    rng = np.random.RandomState(seed)
    n = 40
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype="int64"),
            "c": rng.choice(["a", "b"], n),
            "y": rng.normal(size=n),
        }
    )
    row = int(rng.randint(n))
    df2 = df.copy()
    df2.loc[row, "y"] = df2.loc[row, "y"] + 1000.0

    def run(frame):
        ds = _ds(frame)
        node = ["c"] >> ops.TargetEncoding(
            "y", target_mean=0.0, kfold=4, fold_on=["i"], out_col="te"
        )
        wf = Workflow(node + ["i"])
        return (
            wf.fit(ds).transform(ds).to_pandas().sort_values("i").reset_index(drop=True)
        )

    a, b = run(df), run(df2)
    # the perturbed row's own TE is leakage-free: unchanged
    np.testing.assert_allclose(a.loc[row, "te"], b.loc[row, "te"], rtol=1e-5)
    # but the perturbation IS visible somewhere else (sanity: stats not ignored)
    assert not np.allclose(a["te"], b["te"], rtol=1e-5)


@settings(**_SETTINGS)
@given(st.integers(0, 10_000))
def test_asof_join_point_in_time_property(seed):
    """North-star semantics: for every left row, the joined value is from
    the LATEST right row of the same key with right.ts <= left.ts — and
    never from the future (zero temporal leakage), checked against a
    brute-force oracle."""
    from nvtabular_ray.pipelines.temporal import asof_join

    rng = np.random.RandomState(seed)
    nl, nr = 25, 30
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 3, nl).astype("int64"),
            "ts": rng.randint(0, 1000, nl).astype("int64"),
            "lid": np.arange(nl, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 3, nr).astype("int64"),
            "ts": rng.randint(0, 1000, nr).astype("int64"),
            "val": rng.randint(0, 10_000, nr).astype("int64"),
        }
    )
    # dedupe (k, ts) on the right so "latest" is unambiguous
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)

    out = (
        asof_join(_ds(left), _ds(right), key="k", left_ts="ts")
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    for _, row in left.iterrows():
        cand = right[(right["k"] == row["k"]) & (right["ts"] <= row["ts"])]
        expect = None if cand.empty else int(cand.sort_values("ts")["val"].iloc[-1])
        got = out.loc[out["lid"] == row["lid"], "val"].iloc[0]
        if expect is None:
            assert pd.isna(got)
        else:
            assert int(got) == expect


@settings(**_SETTINGS)
@given(st.integers(0, 10_000))
def test_rolling_window_matches_bruteforce(seed):
    """Trailing-window count/sum equals the O(n^2) brute-force oracle over
    [ts - window, ts] per entity — inclusive both edges (SQL RANGE W
    PRECEDING parity), past-only."""
    from nvtabular_ray.pipelines.temporal import windowed_agg

    rng = np.random.RandomState(seed)
    n = 30
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype="int64"),
            "e": rng.randint(0, 3, n).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 500, n), unit="s"),
            "v": rng.normal(size=n),
        }
    )
    w = int(rng.randint(5, 120))
    out = (
        windowed_agg(_ds(df), "e", "ts", "v", w, ["count", "sum"], prefix="w_")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    merged = df.merge(out[["i", "w_count", "w_sum"]], on="i")
    for _, row in merged.iterrows():
        in_w = merged[
            (merged["e"] == row["e"])
            & (merged["ts"] <= row["ts"])
            & (merged["ts"] >= row["ts"] - pd.Timedelta(seconds=w))
        ]
        assert int(row["w_count"]) == len(in_w)
        np.testing.assert_allclose(row["w_sum"], in_w["v"].sum(), rtol=1e-9)


@settings(**_SETTINGS)
@given(st.integers(0, 10_000))
def test_backfill_matches_pandas_ffill(seed):
    """Forward backfill equals per-entity pandas ffill over ts order — and
    never pulls a value from the future (past-only, zero leakage)."""
    from nvtabular_ray.pipelines.temporal import backfill

    rng = np.random.RandomState(seed)
    n = 30
    df = pd.DataFrame(
        {
            "i": np.arange(n, dtype="int64"),
            "e": rng.randint(0, 3, n).astype("int64"),
            "ts": pd.to_datetime(
                rng.permutation(np.arange(n)) * 10, unit="s"
            ),  # unique per-row ts
            "v": np.where(rng.rand(n) < 0.4, np.nan, rng.normal(size=n)),
        }
    )
    out = (
        backfill(_ds(df), "e", "ts", ["v"], direction="forward")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    oracle = (
        df.sort_values(["e", "ts"]).groupby("e")["v"].ffill()
    )
    oracle = oracle.reindex(df.sort_values(["e", "ts"]).index).sort_index()
    np.testing.assert_allclose(
        out["v_filled"].to_numpy(), oracle.to_numpy(), rtol=1e-9, equal_nan=True
    )


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=300),
        min_size=1,
        max_size=12,
    ),
    size=st.integers(min_value=5, max_value=64),
    overlap=st.integers(min_value=0, max_value=4),
)
def test_chunk_documents_property(texts, size, overlap):
    """chunk_documents == per-doc Python slicing spec for arbitrary ASCII
    text and (size, overlap)."""
    import pandas as pd
    import ray.data as rd

    from nvtabular_ray.functions.text import chunk_documents

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(2)
    out = (
        chunk_documents(ds, chunk_size=size, overlap=overlap)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    stride = size - overlap
    for d, s in enumerate(texts):
        m = 1 if len(s) <= size else -(-(len(s) - size) // stride) + 1
        exp = [s[c * stride : c * stride + size] for c in range(m)]
        assert out[out.doc_id == d]["chunk_text"].tolist() == exp


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=400),
    cap=st.integers(min_value=1, max_value=2048),
)
def test_pack_bins_property(sizes, cap):
    """FFD invariants for arbitrary sizes incl. zero and oversize items:
    within-capacity bins (except oversize singletons), all items assigned,
    deterministic."""
    import numpy as np
    import pandas as pd

    from nvtabular_ray.functions.packing import pack_bins_ffd

    arr = np.array(sizes, dtype=np.int64)
    bins = pack_bins_ffd(arr, cap)
    assert len(bins) == len(arr) and (bins >= 0).all()
    sums = pd.Series(arr).groupby(bins).sum()
    maxes = pd.Series(arr).groupby(bins).max()
    for b in sums.index:
        # a bin exceeds capacity ONLY because of a single oversize item
        # (zero-size items may legally ride along in any bin)
        assert sums[b] <= cap or maxes[b] > cap
        if maxes[b] > cap:
            assert sums[b] == maxes[b]  # nothing non-zero shares an oversize bin
    assert np.array_equal(bins, pack_bins_ffd(arr, cap))


@settings(**_SETTINGS)
@given(st.integers(0, 10_000))
def test_windowed_distinct_matches_bruteforce(seed):
    """Windowed count(DISTINCT) — all three window modes against the
    O(n^2) set-based oracle, with ts ties, nulls, and tiny vocab (heavy
    duplicate-interval overlap, the union-telescoping stress case)."""
    from nvtabular_ray.functions.grouped_np import (
        dict_codes,
        distinct_over_bounds,
        grouped_expanding_bounds,
        grouped_window_bounds,
        grouped_window_bounds_leading,
    )

    rng = np.random.RandomState(seed)
    n = 40
    ents = np.sort(rng.randint(0, 4, n)).astype(np.int64)
    # per-entity sorted ts with frequent ties
    ts = np.empty(n, dtype=np.int64)
    for e in np.unique(ents):
        m = ents == e
        ts[m] = np.sort(rng.randint(0, 60, m.sum()))
    vocab = ["a", "b", "c", None]
    vals = [vocab[i] for i in rng.randint(0, len(vocab), n)]
    arr = pa.chunked_array([pa.array(vals)])
    codes, valid = dict_codes(arr)
    W = int(rng.randint(1, 40))

    def brute(lo_i, hi_i):
        # distinct non-null values among rows j of the same entity with
        # lo_i[i] <= j < hi_i[i]
        return np.array(
            [len({vals[j] for j in range(lo, hi) if vals[j] is not None})
             for lo, hi in zip(lo_i, hi_i)],
            dtype=np.int64,
        )

    for mode, (w, e) in {
        "trail": grouped_window_bounds(ts, ents, W),
        "lead": grouped_window_bounds_leading(ts, ents, W),
        "expanding": grouped_expanding_bounds(ts, ents),
    }.items():
        got = distinct_over_bounds(codes, valid, np.asarray(w), np.asarray(e), ents)
        np.testing.assert_array_equal(got, brute(w, e), err_msg=mode)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
                max_size=14,
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 3),
    st.integers(0, 8),
)
def test_line_dedup_property(doc_lines, min_dup, min_chars):
    """line_dedup == the whole-corpus Counter spec for arbitrary unicode
    lines and (min_dup, min_line_chars): lines shorter than min_chars are
    never removed, others vanish everywhere once their corpus count hits
    min_dup, docs reassemble in order, fully-emptied docs drop."""
    from collections import Counter

    from nvtabular_ray.functions.dedup import line_dedup

    docs = {i: "\n".join(ls) for i, ls in enumerate(doc_lines)}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (
        line_dedup(_ds(df), min_dup=min_dup, min_line_chars=min_chars)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    counts = Counter(
        ln for s in docs.values() for ln in s.split("\n") if len(ln) >= min_chars
    )
    expect = {}
    for i, s in docs.items():
        kept = [ln for ln in s.split("\n") if len(ln) < min_chars or counts[ln] < min_dup]
        if kept:
            expect[i] = ("\n".join(kept), len(s.split("\n")) - len(kept))
    assert out["doc_id"].tolist() == sorted(expect)
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for _, r in out.iterrows()}
    assert got == expect
