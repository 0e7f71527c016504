"""Pins for the round-4 self-review findings (diff-focused pass over
f598529..HEAD): cold-bucket expanding sums must be frame-local (bit-equal
to the fixed ExpandingAgg plan under adversarial magnitudes), the ANN
top-k reduce must preserve the real id dtype when the plan yields zero
blocks, and dedup/decontamination must share ONE gram spec."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_hot_split_cold_expanding_bit_equals_default_plan():
    """A huge-magnitude entity preceding a tiny one in the same cold
    bucket: a global-cumsum difference drifts 1 ulp on the tiny entity's
    cum_sum; the cold path must accumulate group-locally like the op."""
    from nvtabular_ray.ops.temporal_ops import ExpandingAgg
    from nvtabular_ray.pipelines.hot_split import ordered_features
    from nvtabular_ray.selector import ColumnSelector

    rng = np.random.RandomState(5)
    rows = []
    for uid, scale in [("a_huge", 1e10), ("b_tiny", 1.0)]:
        for i in range(200):
            rows.append((uid, i, (rng.rand() - 0.5) * scale))
    df = pd.DataFrame(rows, columns=["user", "ts", "value"])
    tab = pa.Table.from_pandas(df, preserve_index=False)

    # direct op transform on the key-sorted table = the default plan kernel
    op = ExpandingAgg("user", "ts", aggs=("sum", "mean"))
    want = op.transform(ColumnSelector(["value"]), tab)

    out = (
        ordered_features(
            rd.from_arrow(tab).repartition(2),
            "user",
            "ts",
            [{"kind": "expanding", "col": "value", "aggs": ["sum", "mean"]}],
            hot_threshold=10_000,  # nothing is hot: pure cold-bucket path
            num_buckets=1,  # both entities share one bucket
        )
        .to_pandas()
        .sort_values(["user", "ts"])
        .reset_index(drop=True)
    )
    got = out["value_cum_sum"].to_numpy()
    exp = want.column("value_cum_sum").to_numpy(zero_copy_only=False)
    # bitwise equality, NaN-aware (first instant of each entity is NaN)
    assert np.array_equal(got, exp, equal_nan=True)


def test_ann_zero_row_plans_stay_well_formed():
    from nvtabular_ray.functions.ann import brute_force_topk

    t = pa.table(
        {
            "vec_id": pa.array(["v1", "v2"], pa.string()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], pa.list_(pa.float32())),
        }
    )
    q = np.array([1.0, 0.0])

    # Ray Data drops all-empty output blocks, so a zero-row plan reaches the
    # reduce with NO refs and NO schema (dataset_arrow_schema -> None);
    # dtype recovery is impossible there, but the result must still be a
    # WELL-FORMED (vec_id, sim) table — never column-less, never a crash
    # (assert on the Dataset schema, not to_pandas(): Ray quirk —
    # Dataset.to_pandas() on a zero-row dataset returns a COLUMN-LESS frame
    # even when the schema is known)
    for empty in (
        rd.from_arrow(t).map_batches(lambda b: b.slice(0, 0), batch_format="pyarrow"),
        rd.from_arrow(t).filter(lambda r: False),
    ):
        out = brute_force_topk(empty, q, k=3, id_col="vec_id")
        assert out.count() == 0
        assert sorted(out.schema().names) == ["sim", "vec_id"]


def test_gram_spec_shared_between_dedup_and_decontaminate():
    """One tokenization spec: the decontamination gram builder must produce
    exactly the dedup builder's grams for long docs, and zero grams (vs
    whole-doc fallback) for short docs."""
    from nvtabular_ray.functions.decontaminate import _doc_ngram_hashes
    from nvtabular_ray.functions.dedup import _word_ngram_hashes, word_ngrams

    texts = ["The  Quick\tbrown FOX jumps over the lazy dog today", "too short"]
    n = 5
    dedup_grams = word_ngrams(texts, n, short_doc="whole")
    decon_grams = word_ngrams(texts, n, short_doc="skip")
    assert np.array_equal(dedup_grams[0], decon_grams[0])  # long doc identical
    assert dedup_grams[1].tolist() == ["too short"] and len(decon_grams[1]) == 0

    # and the hash pipelines agree on the long doc's hash SET
    bounds, flat = _doc_ngram_hashes(texts, n)
    per_doc = _word_ngram_hashes(texts, n)
    assert set(flat[bounds[0] : bounds[1]].tolist()) == set(
        per_doc[0].astype(np.uint64).tolist()
    )
    assert bounds[2] - bounds[1] == 0  # short doc contributes nothing
