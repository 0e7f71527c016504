"""ContextConcat: previous-k-turns context assembly (leakage-free)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nvtabular_ray import Workflow, ops
from nvtabular_ray.transcripts import generate_transcripts_pandas


def _pd_oracle(df, key, order, text_col, k, sep, render=None):
    """Row-by-row spec: join of the previous <=k non-null rendered texts of
    the same entity (oldest first); NULL when none exist."""
    out = []
    for _, g in df.sort_values([key] + order, kind="mergesort").groupby(key, sort=False):
        texts = [
            (render(r) if render else r[text_col]) for _, r in g.iterrows()
        ]
        for i in range(len(texts)):
            prev = [t for t in texts[max(0, i - k) : i] if t is not None]
            out.append((g.index[i], sep.join(prev) if prev else None))
    s = pd.Series({i: v for i, v in out})
    return s.reindex(df.index)


@pytest.fixture(scope="module")
def tdf():
    df = generate_transcripts_pandas(25, seed=7, max_turns=60)
    return df.sample(frac=1.0, random_state=3).reset_index(drop=True)  # unordered input


def test_context_concat_transcripts_oracle(tdf):
    ds = rd.from_arrow(pa.Table.from_pandas(tdf, preserve_index=False)).repartition(4)
    ctx = ["text"] >> ops.ContextConcat(
        partition_cols="conv_id", sort_cols=["turn_idx"], k=3, sep="\n",
        prefix_col="role", prefix_sep=": ",
    )
    wf = Workflow(ctx + ["conv_id", "turn_idx"])
    got = (
        wf.fit(ds).transform(ds).to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = tdf.copy()
    want["text_ctx3"] = _pd_oracle(
        tdf, "conv_id", ["turn_idx"], "text", 3, "\n",
        render=lambda r: f"{r['role']}: {r['text']}",
    )
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text_ctx3"].tolist() == want["text_ctx3"].tolist()
    # zero leakage: a row's context never contains its own text
    joined = got.merge(want[["conv_id", "turn_idx", "text"]], on=["conv_id", "turn_idx"])
    mask = joined["text_ctx3"].notna()
    assert not any(
        t in c for t, c in zip(joined["text"][mask], joined["text_ctx3"][mask]) if len(t) > 20
    )


def test_context_concat_nulls_and_empty_frames():
    # entity a: null text inside the frame is skipped; first row -> NULL;
    # all-null frame -> NULL (regression for the pyarrow skip-join kernel
    # dropping all-null rows and shrinking the output)
    t = pa.table(
        {
            "e": ["a"] * 4 + ["b"] * 2,
            "i": [0, 1, 2, 3, 0, 1],
            "txt": [None, None, "x", "y", "p", "q"],
        }
    )
    op = ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=2, sep="|")
    from nvtabular_ray.selector import ColumnSelector

    out = op.transform(ColumnSelector(["txt", "e", "i"]), t)
    assert out.num_rows == 6
    assert out.column("txt_ctx2").to_pylist() == [None, None, None, "x", None, "p"]


def test_context_concat_unsorted_in_group_order_path():
    # key-sorted but time-UNsorted within the entity: the op must lexsort
    # internally and scatter results back to input positions
    t = pa.table({"e": ["a"] * 4, "i": [3, 0, 2, 1], "txt": ["d", "a", "c", "b"]})
    from nvtabular_ray.selector import ColumnSelector

    op = ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=2, sep="|")
    out = op.transform(ColumnSelector(["txt", "e", "i"]), t)
    assert out.column("txt_ctx2").to_pylist() == ["b|c", None, "a|b", "a"]


def test_context_concat_numeric_cast_and_empty():
    from nvtabular_ray.selector import ColumnSelector

    t = pa.table({"e": ["a", "a"], "i": [0, 1], "v": [1, 2]})
    op = ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=1)
    out = op.transform(ColumnSelector(["v", "e", "i"]), t)
    assert out.column("v_ctx1").to_pylist() == [None, "1"]
    empty = t.slice(0, 0)
    out0 = op.transform(ColumnSelector(["v", "e", "i"]), empty)
    assert out0.num_rows == 0 and out0.column("v_ctx1").type == pa.string()


def test_context_concat_prefix_null_emits_null_piece():
    # SQL `prefix || ': ' || text` is NULL when prefix is NULL -> skipped
    from nvtabular_ray.selector import ColumnSelector

    t = pa.table(
        {"e": ["a"] * 3, "i": [0, 1, 2], "r": [None, "u", "u"], "txt": ["x", "y", "z"]}
    )
    op = ops.ContextConcat(partition_cols="e", sort_cols=["i"], k=2, sep="|", prefix_col="r")
    out = op.transform(ColumnSelector(["txt", "e", "i", "r"]), t)
    assert out.column("txt_ctx2").to_pylist() == [None, None, "u: y"]


def test_context_budget_matches_brute_force():
    import numpy as np

    from nvtabular_ray.selector import ColumnSelector

    rng = np.random.default_rng(5)
    n = 300
    e = np.sort(rng.integers(0, 6, n))
    txt = [None if rng.random() < 0.1 else f"t{j}" for j in range(n)]
    tok = rng.integers(0, 9, n)
    t = pa.table(
        {"e": pa.array(e), "i": pa.array(np.arange(n)),
         "txt": pa.array(txt, pa.string()), "tok": pa.array(tok.astype("int64"))}
    )
    for k, budget in [(None, 12), (3, 12), (None, 0)]:
        op = ops.ContextConcat(
            "e", k=k, sort_cols=["i"], sep="|", budget=budget, budget_col="tok"
        )
        got = op.transform(ColumnSelector(["txt", "e", "i", "tok"]), t)
        got = got.column(0).to_pylist()
        want = []
        for j in range(n):
            s, total = j, 0
            while (
                s > 0 and e[s - 1] == e[j] and total + tok[s - 1] <= budget
                and (k is None or j - (s - 1) <= k)
            ):
                total += tok[s - 1]
                s -= 1
            pieces = [txt[m] for m in range(s, j) if txt[m] is not None]
            want.append("|".join(pieces) if pieces else None)
        assert got == want, (k, budget)


def test_context_budget_validates():
    with pytest.raises(ValueError):
        ops.ContextConcat("e", budget=10)  # budget_col required
    with pytest.raises(ValueError):
        ops.ContextConcat("e", k=None)  # k=None only valid with budget
