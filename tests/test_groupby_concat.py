"""Groupby "concat" aggregation (ordered string_agg)."""

import pyarrow as pa
import ray.data as rd

from nvtabular_ray import Workflow, ops


def _ds(blocks=3):
    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "ts": [3, 1, 2, 2, 1, 1],
            "txt": ["z", "x", None, "q", "p", None],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _run(aggs, ray_session=None):
    node = ["g", "ts", "txt", "v"] >> ops.Groupby(
        groupby_cols="g", sort_cols="ts", aggs=aggs, concat_sep="|"
    )
    out = Workflow(node).fit(_ds()).transform(_ds()).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


def test_concat_arrow_path(ray_session):
    out = _run({"txt": ["concat"]})
    # in-group ts order; null skipped; all-null group -> NULL
    assert out["txt_concat"].tolist() == ["x|z", "p|q", None]


def test_concat_pandas_path_via_median(ray_session):
    out = _run({"txt": ["concat"], "v": ["median"]})
    assert out["txt_concat"].tolist() == ["x|z", "p|q", None]
    assert out["v_median"].tolist() == [2.0, 4.5, 6.0]


def test_concat_casts_non_string(ray_session):
    out = _run({"v": ["concat"]})
    assert out["v_concat"].tolist() == ["2|3|1", "5|4", "6"]


def test_concat_rendering_identical_across_paths(ray_session):
    # review fix: pandas fallback used str() (True/1.0) while arrow used
    # pc.cast (true/1) — an unrelated median must not change concat output
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({"g": ["a", "a"], "ts": [1, 2], "b": [True, False], "v": [1.0, 2.0]})

    def run(aggs):
        node = ["g", "ts", "b", "v"] >> ops.Groupby(
            groupby_cols="g", sort_cols="ts", aggs=aggs, concat_sep="|"
        )
        ds = rd.from_arrow(t)
        return Workflow(node).fit(ds).transform(ds).to_pandas()

    arrow_path = run({"b": ["concat"]})
    pandas_path = run({"b": ["concat"], "v": ["median"]})
    assert arrow_path["b_concat"].tolist() == pandas_path["b_concat"].tolist() == ["true|false"]
