"""Incremental (seen-corpus) exact dedup."""

import pyarrow as pa
import ray.data as rd

from nvtabular_ray.functions.dedup import dedup_incremental


def _ds(rows, blocks=3):
    t = pa.table(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "n": [r[2] for r in rows],
        }
    )
    return rd.from_arrow(t).repartition(blocks)


SEEN = [(100, "alpha", 1), (101, "beta", 2), (102, "alpha", 3)]
NEW = [
    (1, "alpha", 10),   # in seen -> dropped
    (2, "gamma", 20),   # fresh, first copy
    (5, "gamma", 21),   # within-new dup
    (3, "delta", 30),   # fresh
    (4, "beta", 40),    # in seen -> dropped
]


def test_incremental_shuffle_and_broadcast_agree():
    for bc in (False, True):
        out = dedup_incremental(_ds(NEW), _ds(SEEN), ["text"], "doc_id", broadcast=bc)
        df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert df["doc_id"].tolist() == [2, 3]
        assert df["text"].tolist() == ["gamma", "delta"]
        # the r2 dtype-drift trap: null-padded union must not float ints
        assert df["doc_id"].dtype.kind == "i" and df["n"].dtype.kind == "i"


def test_incremental_keep_within_new_dups():
    out = dedup_incremental(
        _ds(NEW), _ds(SEEN), ["text"], "doc_id", dedup_new=False
    ).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 5]


def test_incremental_empty_seen_equals_exact_dedup():
    for bc in (False, True):  # broadcast path crashed on empty seen (review fix)
        empty = _ds(SEEN).filter(lambda r: False)
        out = dedup_incremental(
            _ds(NEW), empty, ["text"], "doc_id", broadcast=bc
        ).to_pandas()
        assert sorted(out["doc_id"]) == [1, 2, 3, 4]


def test_incremental_multi_key():
    seen = _ds([(9, "a", 1)])
    new = _ds([(1, "a", 1), (2, "a", 2)])
    out = dedup_incremental(new, seen, ["text", "n"], "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [2]
