"""Pins for the round-4 advisor findings fixed in round 5.

1. pruned_projection must NOT re-issue a read that carries options
   (filter=, include_paths=, block_udf, ...) — the fast path dropped them
   and fed unfiltered rows to every stat fit.
2. knn_join must tolerate empty query blocks (routine after upstream
   filters/unions).
3. knn_join_ivf at nprobe < nlist must be partition-invariant: the same
   result at any num_buckets (candidates used to be the union of
   co-bucketed cells).
4. grouped_reduce/fused_grouped_reduce memory guard fires from object-
   store metadata BEFORE materializing on the driver.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd


@pytest.fixture(scope="module")
def small_parquet(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pp"))
    pq.write_table(
        pa.table({"a": [1, 2, 3, 4], "b": [10.0, 20.0, 30.0, 40.0]}),
        os.path.join(d, "x.parquet"),
    )
    return d


def test_pruned_projection_preserves_filter(ray_session, small_parquet):
    from nvtabular_ray.arrow_utils import pruned_projection

    ds = rd.read_parquet(small_parquet, filter=pc.field("a") > 2)
    out = pruned_projection(ds, ["a"]).to_pandas()["a"].tolist()
    assert sorted(out) == [3, 4]  # the advice repro returned [1, 2, 3, 4]


def test_pruned_projection_fast_path_still_engages(ray_session, small_parquet):
    from nvtabular_ray.arrow_utils import pruned_projection

    pr = pruned_projection(rd.read_parquet(small_parquet), ["a"])
    # option-free read: re-issued as a bare pruned Read (no Project node)
    assert type(pr._logical_plan.dag).__name__ == "Read"
    assert sorted(pr.to_pandas()["a"].tolist()) == [1, 2, 3, 4]
    # optioned reads fall back to select_columns
    pr2 = pruned_projection(
        rd.read_parquet(small_parquet, include_paths=True), ["a"]
    )
    assert type(pr2._logical_plan.dag).__name__ != "Read"


def _emb_ds(n, d=8, seed=0, id_start=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d))
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(id_start, id_start + n, dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, r)) for r in emb], pa.list_(pa.float64())
            ),
        }
    )
    return rd.from_arrow(tab).repartition(4)


def test_knn_join_empty_query_block(ray_session):
    from nvtabular_ray.functions.ann import knn_join

    index = _emb_ds(50, seed=1)
    # filter removes every row: knn_join used to crash on the (0,0) matmul
    query = _emb_ds(20, seed=2, id_start=100).filter(lambda r: False)
    assert knn_join(query, index, k=3).count() == 0
    # mixed plan: empty blocks interleaved with real ones must not poison
    # the result (this is the shape that crashed mid-pipeline before)
    mixed = _emb_ds(10, seed=5, id_start=200).union(query)
    out = knn_join(mixed, index, k=3).to_pandas()
    assert sorted(out.columns) == ["neighbor_id", "query_id", "rank", "sim"]
    assert len(out) == 30 and out["query_id"].nunique() == 10
    # empty INDEX side (everything filtered upstream): zero candidates,
    # not a (b, d) @ (0, 0) shape error
    empty_index = _emb_ds(5, seed=6).filter(lambda r: False)
    assert knn_join(_emb_ds(10, seed=5, id_start=300), empty_index, k=3).count() == 0


def test_knn_join_ivf_partition_invariant(ray_session):
    from nvtabular_ray.functions.ann import IVFIndex, knn_join_ivf

    index_ds = _emb_ds(300, seed=3)
    query_ds = _emb_ds(40, seed=4, id_start=1000)
    ivf = IVFIndex.train(index_ds, nlist=8, embedding_col="embedding")

    def run(num_buckets):
        return (
            knn_join_ivf(
                _emb_ds(40, seed=4, id_start=1000),
                _emb_ds(300, seed=3),
                k=5,
                nlist=8,
                nprobe=2,  # reduced probe: the shape that used to vary
                index=ivf,
                num_buckets=num_buckets,
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )

    a, b = run(2), run(7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_grouped_reduce_memory_guard_pre_get(ray_session):
    from nvtabular_ray.functions.aggregates import grouped_reduce

    df = pd.DataFrame({"k": np.arange(20000) % 977, "v": np.ones(20000)})
    parts = rd.from_pandas(df)  # raw rows double as "partials"
    with pytest.raises(MemoryError, match="too large to collect"):
        grouped_reduce(parts, ["k"], {"v": "sum"}, memory_limit=1)
    # sane limit still works
    out = grouped_reduce(parts, ["k"], {"v": "sum"}, memory_limit=1 << 30)
    assert len(out) == 977


def test_l2_normalize_and_kmeans_on_union_with_empty(ray_session):
    """Two latent crashes found by the r5 empty-block audit: (a)
    l2_normalize's in-place divide on a READ-ONLY zero-copy plasma view
    (from_arrow/union inputs; the parquet path happened to copy); (b)
    fit_kmeans' sample init via to_arrow_refs, whose internal schema fetch
    hits a Ray 2.49 AssertionError on limit-over-union-with-empty plans."""
    from nvtabular_ray.functions.clustering import assign_clusters, fit_kmeans
    from nvtabular_ray.functions.pooling import l2_normalize

    mixed = _emb_ds(10, seed=5).union(_emb_ds(5, seed=6).filter(lambda r: False))
    assert l2_normalize(mixed).count() == 10
    cents = fit_kmeans(mixed, k=2, iters=2)
    assert cents.shape == (2, 8)
    assert assign_clusters(mixed, cents).count() == 10
