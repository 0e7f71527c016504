"""Property tests: ContextConcat and GroupRank vs pure-Python specs.

Direct ``op.transform`` calls on entity-sorted (but in-group shuffled)
tables — the exact contract the bucketed shuffle delivers — against
row-by-row oracles on adversarial unicode/None inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from nvtabular_ray import ops
from nvtabular_ray.selector import ColumnSelector

_SETTINGS = dict(max_examples=20, deadline=None)


@st.composite
def transcript_frames(draw):
    n = draw(st.integers(1, 50))
    ents = draw(st.lists(st.integers(0, 4), min_size=n, max_size=n))
    ts = draw(st.lists(st.integers(0, 9), min_size=n, max_size=n))
    texts = draw(
        st.lists(st.one_of(st.text(max_size=6), st.none()), min_size=n, max_size=n)
    )
    rows = sorted(zip(ents, ts, texts, range(n)), key=lambda r: r[0])  # entity-sorted only
    return rows, draw(st.integers(1, 4))


def _spec_ctx(rows, k, sep):
    # total order: (entity, ts, uid); context = previous <=k non-null texts
    by_ent = {}
    for e, t, x, u in rows:
        by_ent.setdefault(e, []).append((t, u, x))
    out = {}
    for e, lst in by_ent.items():
        lst.sort(key=lambda r: (r[0], r[1]))
        for i, (t, u, x) in enumerate(lst):
            prev = [p[2] for p in lst[max(0, i - k) : i] if p[2] is not None]
            out[u] = sep.join(prev) if prev else None
    return out


@settings(**_SETTINGS)
@given(transcript_frames())
def test_context_concat_property(args):
    rows, k = args
    t = pa.table(
        {
            "e": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "txt": pa.array([r[2] for r in rows], pa.string()),
            "uid": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    op = ops.ContextConcat(partition_cols="e", sort_cols=["ts", "uid"], k=k, sep="\x1f")
    got = op.transform(ColumnSelector(["txt", "e", "ts", "uid"]), t)
    spec = _spec_ctx(rows, k, "\x1f")
    assert got.column("txt_ctx%d" % k).to_pylist() == [spec[r[3]] for r in rows]


@settings(**_SETTINGS)
@given(transcript_frames())
def test_group_rank_property(args):
    rows, _ = args
    t = pa.table(
        {
            "e": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "uid": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    sel = ColumnSelector(["e", "ts", "uid"])
    rn = ops.GroupRank("e", ["ts", "uid"]).transform(sel, t).column("row_number").to_pylist()
    dr = ops.GroupRank("e", ["ts"], method="dense_rank").transform(sel, t)
    dr = dr.column("dense_rank").to_pylist()
    by_ent = {}
    for e, ts, _x, u in rows:
        by_ent.setdefault(e, []).append((ts, u))
    want_rn, want_dr = {}, {}
    for e, lst in by_ent.items():
        lst.sort()
        seen_ts = []
        for i, (ts, u) in enumerate(lst):
            want_rn[u] = i + 1
            if not seen_ts or ts != seen_ts[-1]:
                seen_ts.append(ts)
            want_dr[u] = len(seen_ts)
    assert rn == [want_rn[r[3]] for r in rows]
    assert dr == [want_dr[r[3]] for r in rows]
