"""Property tests for the session-5 operators: conversation_dedup vs a
DuckDB fold, classifier/LM scoring vs the pure-Python spec, and
sample_per_group invariants — adversarial inputs (null content, ties,
unicode, hot groups, empty frames)."""

import duckdb
import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings, strategies as st

_SETTINGS = dict(max_examples=4, deadline=None)

_TOKENS = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=12,
)


@st.composite
def event_frames(draw):
    n_users = draw(st.integers(1, 12))
    types = draw(st.lists(st.sampled_from(["a", "b", "cc", "d\x1fe", "ü"]), min_size=1, max_size=4))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    rows = []
    eid = 0
    for u in range(n_users):
        n = rng.randint(1, 8)
        for i in range(n):
            rows.append((u, int(rng.randint(0, 5)), eid, types[rng.randint(0, len(types))]))
            eid += 1
    # duplicate a random subset of users under new ids (the dedup target)
    for u in rng.choice(n_users, size=rng.randint(0, n_users), replace=False):
        for (uu, ts, _, et) in [r for r in rows if r[0] == u]:
            rows.append((int(u) + 100, ts, eid, et))
            eid += 1
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])


@settings(**_SETTINGS)
@given(event_frames())
def test_conversation_dedup_vs_duckdb(ray_session, df):
    from nvtabular_ray.functions.dedup import conversation_dedup

    out = (
        conversation_dedup(rd.from_pandas(df).repartition(3), sep="\x1e", num_buckets=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df)
    odf = (
        con.execute(
            """
        WITH seq AS (
          SELECT user_id,
                 ('0x' || substr(md5(COALESCE(string_agg(event_type, chr(30)
                      ORDER BY ts, event_id), '')), 1, 15))::BIGINT AS fp
          FROM events GROUP BY user_id
        ),
        k AS (SELECT fp, min(user_id) AS keeper FROM seq GROUP BY fp)
        SELECT s.user_id, s.fp, k.keeper,
               CAST(s.user_id = k.keeper AS BIGINT) AS is_keeper
        FROM seq s JOIN k USING (fp)
        """
        )
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(out) == len(odf)
    for c in ["user_id", "fp", "keeper", "is_keeper"]:
        assert (out[c].to_numpy() == odf[c].to_numpy()).all(), c


@settings(**_SETTINGS)
@given(st.lists(_TOKENS, min_size=0, max_size=30), st.integers(16, 256))
def test_scoring_vs_python_spec(ray_session, texts, dim):
    import hashlib

    from nvtabular_ray.functions.classifier import (
        classifier_score,
        default_logprobs,
        default_weights,
        lm_perplexity,
    )

    if not texts:
        return
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(2)
    got_c = classifier_score(ds, dim=dim, bias=0.3).to_pandas().sort_values("doc_id")
    got_l = lm_perplexity(ds, dim=dim).to_pandas().sort_values("doc_id")

    w, lp = default_weights(dim), default_logprobs(dim)

    def b(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % dim

    for i, t in enumerate(texts):
        toks = [x for x in t.split() if x]
        m = float(np.mean([w[b(x)] for x in toks])) if toks else 0.0
        exp_c = 1.0 / (1.0 + np.exp(-(m + 0.3)))
        assert abs(got_c.iloc[i]["clf_score"] - exp_c) < 1e-12
        if len(toks) < 2:
            exp_l = 1.0
        else:
            ls = [lp[b(a + " " + c)] for a, c in zip(toks, toks[1:])]
            exp_l = float(np.exp(-np.mean(ls)))
        assert abs(got_l.iloc[i]["ppl"] - exp_l) < 1e-9 * max(1.0, exp_l)


@settings(**_SETTINGS)
@given(
    st.integers(1, 200),
    st.integers(1, 5),
    st.integers(1, 8),
    st.integers(0, 2**31 - 1),
)
def test_sample_per_group_invariants(ray_session, n, n_groups, k, seed):
    from nvtabular_ray.functions.sampling import sample_per_group

    rng = np.random.RandomState(seed)
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "g": rng.randint(0, n_groups, n).astype(np.int64),
        }
    )
    out1 = sample_per_group(rd.from_pandas(df), "g", "id", k).to_pandas()
    out2 = sample_per_group(rd.from_pandas(df).repartition(5), "g", "id", k).to_pandas()
    # partitioning-invariant, per-group size = min(k, group size), subset of input
    key1 = set(map(tuple, out1[["g", "id"]].to_numpy()))
    key2 = set(map(tuple, out2[["g", "id"]].to_numpy()))
    assert key1 == key2
    sizes = df.groupby("g").size()
    got = out1.groupby("g").size()
    for g, sz in sizes.items():
        assert got.get(g, 0) == min(k, sz)
