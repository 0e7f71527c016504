"""Embedding pooling & normalization."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from nvtabular_ray.functions.pooling import l2_normalize, mean_pool


def _ds(rows, blocks=3):
    t = pa.table(
        {
            "vec_id": list(range(len(rows))),
            "g": [r[0] for r in rows],
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


ROWS = [
    ("a", [1.0, 2.0, 3.0]),
    ("a", [3.0, 2.0, 1.0]),
    ("b", [0.0, 0.0, 0.0]),
    ("a", None),          # null vector: excluded from pooling, null after norm
    (None, [6.0, 6.0, 6.0]),  # null group: its own group
]


def test_mean_pool_matches_numpy():
    out = mean_pool(_ds(ROWS), "g").to_pandas()
    got = {(g if isinstance(g, str) or g is None else g, d): v
           for g, d, v in zip(out["g"], out["dim"], out["mean_val"])}
    assert got[("a", 1)] == 2.0 and got[("a", 2)] == 2.0 and got[("a", 3)] == 2.0
    assert got[("b", 1)] == 0.0
    assert got[(None, 1)] == 6.0
    assert len(out) == 9  # 3 groups x 3 dims


def test_mean_pool_block_invariance():
    a = mean_pool(_ds(ROWS, 1), "g").to_pandas().sort_values(["dim"]).reset_index(drop=True)
    b = mean_pool(_ds(ROWS, 5), "g").to_pandas().sort_values(["dim"]).reset_index(drop=True)
    ka = sorted(zip(a["g"].astype(str), a["dim"], a["mean_val"]))
    kb = sorted(zip(b["g"].astype(str), b["dim"], b["mean_val"]))
    assert ka == kb


def test_l2_normalize_unit_norms_zero_and_null():
    import ray

    t = pa.concat_tables(ray.get(l2_normalize(_ds(ROWS)).to_arrow_refs()))
    t = t.sort_by([("vec_id", "ascending")])
    emb = t.column("embedding").to_pylist()
    v0 = np.array(emb[0])
    np.testing.assert_allclose((v0**2).sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(v0, np.array([1, 2, 3]) / np.sqrt(14), rtol=1e-12)
    assert emb[2] == [0.0, 0.0, 0.0]  # zero vector unchanged
    assert emb[3] is None  # null row stays null


def test_l2_normalize_out_col_keeps_input():
    import ray

    t = pa.concat_tables(ray.get(l2_normalize(_ds(ROWS), out_col="nvec").to_arrow_refs()))
    assert "embedding" in t.column_names and "nvec" in t.column_names
