"""Second round-3 review batch (corpus/function-library edge cases), each
repro-confirmed before fixing:

1. Zero-embedding rows are NOT labeled duplicates of the bucket min id
   (argmax over an all-False close-row returned column 0).
2. grouped kernels see a group boundary at null keys (not_equal(null, x)
   is NULL -> False, which merged null rows into the previous entity).
3. _word_ngram_hashes survives an empty block.
4. decode_wav raises ValueError (not EOFError) on empty payloads.
5. quality_score uses ONE whitespace definition (RE2 ASCII \\s) for word
   count, word chars and stopwords — consistent with text_stats and the
   SQL oracles even on NBSP text.
6. embedding_near_dup's hyperplane cache keys on the real dim (an empty
   first batch cached (0, nbits) planes and crashed later batches).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def test_zero_embedding_not_false_duplicate(ray_session):
    from nvtabular_ray.functions.dedup import _cosine_min_label

    ids = np.array([1, 5], dtype=np.int64)
    emb = np.array([[-1.0, -1.0], [0.0, 0.0]])
    out = _cosine_min_label(ids, emb, 0.95, max_bucket_rows=100)
    assert out.tolist() == [1, 5]  # the zero vector keeps its own id


def test_group_ids_sorted_null_key_boundary():
    from nvtabular_ray.functions.grouped_np import group_ids_sorted, grouped_diff

    t = pa.table({"k": pa.array(["a", "a", None, None, "b"])})
    gid = group_ids_sorted(t, ["k"])
    assert gid.tolist() == [0, 0, 1, 1, 2]
    v = np.array([1.0, 2.0, 10.0, 11.0, 99.0])
    d = grouped_diff(v, gid, 1)
    # lag must NOT cross the a -> null or null -> b boundaries
    assert np.isnan(d[0]) and d[1] == 1.0 and np.isnan(d[2]) and d[3] == 1.0 and np.isnan(d[4])


def test_word_ngram_hashes_empty_batch():
    from nvtabular_ray.functions.dedup import _word_ngram_hashes

    assert _word_ngram_hashes([], 3) == []


def test_decode_wav_bad_payload_raises_valueerror():
    from nvtabular_ray.multimodal.codecs import decode_wav

    for payload in (b"", b"RIFFxxxx", b"\x00" * 16):
        with pytest.raises(ValueError):
            decode_wav(payload)


def test_quality_score_nbsp_single_whitespace_definition(ray_session):
    from nvtabular_ray.functions.text import quality_score, text_stats

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b"])})
    q = quality_score(rd.from_arrow(t)).to_pandas()
    s = text_stats(rd.from_arrow(t)).to_pandas()
    # RE2 \s is ASCII: NBSP is part of the word -> 1 word of length 3
    assert s.loc[0, "n_words"] == 1
    assert q.loc[0, "mean_word_len"] == pytest.approx(3.0)


def test_embedding_near_dup_empty_first_block(ray_session):
    from nvtabular_ray.functions.dedup import embedding_near_dup

    rng = np.random.RandomState(2)
    emb = rng.normal(size=(40, 8))
    t = pa.table({
        "vec_id": pa.array(np.arange(40, dtype=np.int64)),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float64())),
    })
    empty = t.slice(0, 0)
    ds = rd.from_arrow(empty).union(rd.from_arrow(t))
    out = embedding_near_dup(ds, threshold=0.95).to_pandas()
    assert len(out) == 40  # no matmul crash from a (0, nbits) plane cache
