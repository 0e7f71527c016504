"""ListSlice, ValueCount, DataStats, DropLowCardinality, ColumnSimilarity,
metadata/tags tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(df, blocks=2):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


@pytest.fixture()
def list_df():
    return pd.DataFrame(
        {
            "v": [[1, 2, 3, 4, 5], [1], [], [9, 8, 7], [1, 2]],
            "i": np.arange(5, dtype="int64"),
        }
    )


def test_list_slice_variants(list_df):
    cases = [
        (dict(start=3), [r[:3] for r in list_df["v"]]),
        (dict(start=1, end=4), [r[1:4] for r in list_df["v"]]),
        (dict(start=-2), [r[-2:] for r in list_df["v"]]),
        (dict(start=1, end=-1), [r[1:-1] for r in list_df["v"]]),
    ]
    for kwargs, expected in cases:
        wf = Workflow((["v"] >> ops.ListSlice(**kwargs)) + ["i"])
        out = (
            wf.fit(_ds(list_df, 1)).transform(_ds(list_df, 1)).to_pandas().sort_values("i")
        )
        got = [list(x) for x in out["v"]]
        assert got == [list(e) for e in expected], kwargs


def test_list_slice_pad(list_df):
    wf = Workflow(["v"] >> ops.ListSlice(3, pad=True, pad_value=-1))
    out = wf.fit(_ds(list_df, 1)).transform(_ds(list_df, 1)).to_pandas()
    got = [list(x) for x in out["v"]]
    assert all(len(g) == 3 for g in got)
    assert got[1] == [1, -1, -1]
    assert got[2] == [-1, -1, -1]


def test_value_count(list_df):
    wf = Workflow(["v"] >> ops.ValueCount())
    wf.fit(_ds(list_df))
    op = wf._op_nodes()[0].op
    assert op.stats["v"]["value_count"] == {"min": 0, "max": 5}
    meta = wf.output_metadata()
    assert meta["v"]["properties"]["value_count"] == {"min": 0, "max": 5}


def test_data_stats(mixed_ds, mixed_df):
    wf = Workflow(["id", "x", "name_cat"] >> ops.DataStats())
    wf.fit(mixed_ds)
    op = wf._op_nodes()[0].op
    assert op.output["id"]["cardinality"] == mixed_df["id"].nunique()
    assert op.output["name_cat"]["cardinality"] == mixed_df["name_cat"].nunique()
    assert op.output["x"]["mean"] == pytest.approx(mixed_df["x"].mean(), rel=1e-9)
    assert op.output["x"]["per_nan"] == pytest.approx(
        mixed_df["x"].isna().mean() * 100, rel=1e-6
    )
    # string length stats
    assert op.output["name_cat"]["max"] == mixed_df["name_cat"].str.len().max()


def test_drop_low_cardinality():
    df = pd.DataFrame(
        {"keep": ["a", "b", "c", "a"], "drop": ["x", "x", "x", "x"], "i": range(4)}
    )
    wf = Workflow(["keep", "drop"] >> ops.DropLowCardinality(min_cardinality=2))
    out = wf.fit(_ds(df)).transform(_ds(df)).to_pandas()
    assert list(out.columns) == ["keep"]


def test_column_similarity():
    rng = np.random.RandomState(3)
    feats = rng.normal(size=(10, 8))
    df = pd.DataFrame({"a": [0, 1, 2], "b": [1, 1, 5]})
    wf = Workflow([["a", "b"]] >> ops.ColumnSimilarity(feats, metric="cosine"))
    out = wf.fit(_ds(df, 1)).transform(_ds(df, 1)).to_pandas()

    def cos(i, j):
        u, v = feats[i], feats[j]
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

    np.testing.assert_allclose(
        out["a_b_sim"], [cos(0, 1), cos(1, 1), cos(2, 5)], rtol=1e-9
    )


def test_metadata_tags(mixed_ds):
    node = (["x"] >> ops.Normalize() >> ops.AddTags(["target"])) + (
        ["id"] >> ops.TagAsUserID()
    )
    wf = Workflow(node)
    wf.fit(mixed_ds)
    meta = wf.output_metadata()
    assert "continuous" in meta["x"]["tags"] and "target" in meta["x"]["tags"]
    assert set(meta["id"]["tags"]) >= {"id", "user", "user_id"}


def test_embedding_near_dup_and_simhash():
    from nvtabular_ray.functions.dedup import embedding_near_dup, simhash_dedup

    rng = np.random.RandomState(5)
    base = rng.normal(size=(20, 16))
    emb = np.vstack([base, base[:5] + rng.normal(scale=1e-4, size=(5, 16))])
    df = pd.DataFrame({"vec_id": np.arange(25, dtype="int64"), "embedding": list(emb)})
    out = embedding_near_dup(_ds(df, 2), threshold=0.99).to_pandas()
    dup = out[out["vec_id"] >= 20].sort_values("vec_id")
    assert list(dup["cluster_id"]) == [0, 1, 2, 3, 4]

    # simhash needs enough tokens for stable bit votes; with ~200 tokens a
    # one-token edit flips only the few bits whose vote margin is ±1
    base_text = " ".join(f"token{i}" for i in range(200))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                base_text,
                base_text + " extra",
                " ".join(f"other{i}" for i in range(60)),
            ],
        }
    )
    sh = simhash_dedup(_ds(docs, 1)).to_pandas().sort_values("doc_id")
    assert sh["cluster_id"].iloc[1] == 0  # near-dup of doc 0
    assert sh["cluster_id"].iloc[2] == 2


def test_minhash_dedup_clusters():
    from nvtabular_ray.functions.dedup import minhash_lsh_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "ray data streaming execution with backpressure and arrow blocks",
                "ray data streaming execution with backpressure and arrow blocks!!",
                "nvtabular fit transform workflow over dask cudf partitions",
                "zzzz totally unrelated short text",
            ],
        }
    )
    out = minhash_lsh_dedup(_ds(docs, 1)).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].iloc[1] == 0
    assert out["cluster_id"].iloc[2] == 2
    assert out["cluster_id"].iloc[3] == 3


def test_ngram_jaccard_dedup_clusters():
    from nvtabular_ray.functions.dedup import ngram_jaccard, ngram_jaccard_dedup

    base = " ".join(f"w{i}" for i in range(40))
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                base,
                base + " tail",  # jaccard 38/40 ≈ 0.95 on word 3-grams
                " ".join(f"q{i}" for i in range(40)),
            ],
        }
    )
    assert ngram_jaccard(docs.text[0], docs.text[1]) > 0.9
    out = ngram_jaccard_dedup(_ds(docs, 2), threshold=0.8).to_pandas().sort_values("doc_id")
    assert list(out["cluster_id"]) == [0, 0, 2]
    # below-threshold pair stays separate at a tighter threshold
    strict = ngram_jaccard_dedup(_ds(docs, 2), threshold=0.99).to_pandas().sort_values("doc_id")
    assert list(strict["cluster_id"]) == [0, 1, 2]


def test_dataset_gen_from_profile(mixed_ds, mixed_df):
    """DataStats profile -> DatasetGen look-alike (reference tools/data_gen.py
    analog): schema, cardinality and moments should approximate the source."""
    from nvtabular_ray import Workflow, ops as _ops
    from nvtabular_ray.tools import DatasetGen

    wf = Workflow(["id", "x", "name_cat"] >> _ops.DataStats())
    wf.fit(mixed_ds)
    profile = wf._op_nodes()[0].op.output
    gen = DatasetGen(profile, seed=7)
    out = gen.generate(2000, shard_rows=500).to_pandas()
    assert len(out) == 2000
    assert set(out.columns) == {"id", "x", "name_cat"}
    assert out["name_cat"].nunique() <= profile["name_cat"]["cardinality"]
    assert abs(out["x"].mean() - profile["x"]["mean"]) < 0.5
    assert out["id"].between(profile["id"]["min"], profile["id"]["max"]).all()
    # deterministic content (shard ARRIVAL order is not guaranteed by the
    # streaming executor — compare canonically sorted rows)
    out2 = gen.generate(2000, shard_rows=500).to_pandas()
    key = ["id", "x", "name_cat"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ann_bruteforce_lsh_ivf_recall():
    """brute force is exact; LSH and IVF are approximate scale paths that
    must recover most of the true top-k on clustered data."""
    from nvtabular_ray.functions.ann import IVFIndex, brute_force_topk, ivf_topk, lsh_topk

    rng = np.random.RandomState(0)
    centers = rng.normal(size=(8, 16)) * 4
    emb = np.vstack([centers[i % 8] + rng.normal(scale=0.3, size=16) for i in range(400)])
    df = pd.DataFrame({"vec_id": np.arange(400, dtype="int64"), "embedding": list(emb)})
    ds = _ds(df, 4)
    q = emb[0]

    exact = brute_force_topk(ds, q, k=10).to_pandas()
    assert exact["vec_id"].iloc[0] == 0  # the query vector itself
    assert (exact["sim"].to_numpy()[:-1] >= exact["sim"].to_numpy()[1:]).all()

    truth = set(exact["vec_id"])
    lsh = set(lsh_topk(ds, q, k=10).to_pandas()["vec_id"])
    ivf = set(ivf_topk(ds, q, k=10, nlist=8, nprobe=3).to_pandas()["vec_id"])
    assert len(lsh & truth) >= 7
    assert len(ivf & truth) >= 7

    # pre-trained index reuse (the broadcast-once pattern)
    idx = IVFIndex.train(ds, nlist=8)
    ivf2 = set(ivf_topk(ds, q, k=10, index=idx, nprobe=3).to_pandas()["vec_id"])
    assert len(ivf2 & truth) >= 7


def test_column_similarity_tfidf():
    """tfidf metric: idf-weight nonzero term counts then cosine (reference
    column_similarity.py:263-277)."""
    counts = np.array(
        [[2.0, 0.0, 1.0], [2.0, 0.0, 0.0], [0.0, 3.0, 1.0]]
    )  # term 0 df=2, term 1 df=1, term 2 df=2
    df_pairs = pd.DataFrame({"a": [0, 0], "b": [1, 2]})
    wf = Workflow([["a", "b"]] >> ops.ColumnSimilarity(counts, metric="tfidf"))
    out = wf.fit(_ds(df_pairs, 1)).transform(_ds(df_pairs, 1)).to_pandas()

    idf = np.log(3 / np.array([2.0, 1.0, 2.0]))
    w = counts * idf
    w = w / np.linalg.norm(w, axis=1, keepdims=True)
    np.testing.assert_allclose(out["a_b_sim"], [w[0] @ w[1], w[0] @ w[2]], rtol=1e-9)


def test_datastats_hll_approx_distinct():
    """HLL mode: cardinality within ~3% of exact; driver state bounded."""
    rng = np.random.RandomState(2)
    n_true = 40_000
    df = pd.DataFrame(
        {
            "uid": rng.permutation(np.repeat(np.arange(n_true, dtype="int64"), 3)),
            "low": rng.randint(0, 50, size=3 * n_true),
        }
    )
    ds = _ds(df, 6)
    from nvtabular_ray import Workflow, ops as _ops

    wf = Workflow(["uid", "low"] >> _ops.DataStats(approx_distinct=True))
    wf.fit(ds)
    st = wf.output_node.op.output
    assert abs(st["uid"]["cardinality"] - n_true) / n_true < 0.03
    # low-cardinality columns hit HLL's exact linear-counting range
    assert abs(st["low"]["cardinality"] - 50) <= 1
    assert st["uid"]["per_nan"] == 0.0


def test_ann_lsh_no_bucket_matches_returns_empty(ray_session):
    """All-empty partials (no row hashes into any probed bucket) must
    return an empty (id, sim) result, not crash concat_tables([])."""
    import pyarrow as pa
    import ray.data as rd

    from nvtabular_ray.functions.ann import lsh_topk

    rng = np.random.RandomState(5)
    emb = [list(v) for v in rng.normal(size=(50, 16)).astype("float64")]
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(50, dtype="int64")), "embedding": emb})
    )
    # probe_hamming=0 with nbits=16 over 50 rows: the query's single bucket
    # (of 65536) almost surely holds no row; force certainty by querying the
    # opposite orthant of every stored vector
    q = -10.0 * np.asarray(emb[0])
    out = lsh_topk(ds, q, k=5, nbits=16, probe_hamming=0)
    import ray

    # Ray's to_pandas drops columns on a 0-row dataset; assert on the block
    tab = pa.concat_tables(ray.get(out.to_arrow_refs()))
    assert tab.num_rows == 0
    assert tab.schema.names == ["vec_id", "sim"]
    assert tab.schema.field("vec_id").type == pa.int64()


def test_sample_per_group_deterministic(ray_session):
    """k rows per group, membership a pure function of (group, id): same
    result under any partitioning; matches the row_number-over-md5 spec."""
    import hashlib

    import pandas as pd
    import ray.data as rd

    from nvtabular_ray.functions.sampling import sample_per_group

    n = 500
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": np.array(["en", "de", "fr", "es"])[np.arange(n) % 4],
        "payload": np.arange(n) * 1.5,
    })

    def spec(k):
        h = df["doc_id"].map(
            lambda d: int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        )
        s = df.assign(_h=h).sort_values(["_h", "doc_id"])
        return {
            tuple(sorted(g["doc_id"].head(k)))
            for _, g in s.groupby("lang", sort=False)
        }

    for parts in (1, 7):
        out = (
            sample_per_group(rd.from_pandas(df).repartition(parts), "lang", "doc_id", 3)
            .to_pandas()
        )
        got = {
            tuple(sorted(g["doc_id"])) for _, g in out.groupby("lang", sort=False)
        }
        assert got == spec(3), parts
        assert set(out.columns) == {"doc_id", "lang", "payload"}
        assert (out.groupby("lang").size() == 3).all()
    # k larger than the group keeps the whole group
    small = df.head(6)
    out = sample_per_group(rd.from_pandas(small), "lang", "doc_id", 10).to_pandas()
    assert len(out) == 6
