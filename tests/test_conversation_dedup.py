"""Whole-conversation exact dedup (functions/dedup.py conversation_dedup)."""

import numpy as np
import pandas as pd
import ray.data as rd

from nvtabular_ray.functions.dedup import conversation_dedup


def _events(rows):
    # rows: (user_id, ts, event_id, event_type)
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "event_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
        }
    )


def test_conversation_dedup_semantics(ray_session):
    # u1 and u3 have IDENTICAL ordered sequences (a,b,c); u2 has the same
    # multiset in a different ORDER (must NOT collide); u4 is a prefix
    # (must NOT collide); u5 duplicates u1 too -> keeper is min(u1,u3,u5)=1.
    rows = [
        (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"),
        (3, 10, 1, "a"), (3, 20, 2, "b"), (3, 30, 3, "c"),
        (2, 10, 1, "b"), (2, 20, 2, "a"), (2, 30, 3, "c"),
        (4, 10, 1, "a"), (4, 20, 2, "b"),
        (5, 11, 9, "a"), (5, 21, 8, "b"), (5, 31, 7, "c"),
    ]
    out = (
        conversation_dedup(rd.from_pandas(_events(rows)))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3, 4, 5]
    assert out.loc[1, "is_keeper"] == 1 and out.loc[1, "keeper"] == 1
    assert out.loc[3, "is_keeper"] == 0 and out.loc[3, "keeper"] == 1
    assert out.loc[5, "is_keeper"] == 0 and out.loc[5, "keeper"] == 1
    # order matters: u2 is NOT a duplicate of u1
    assert out.loc[2, "is_keeper"] == 1 and out.loc[2, "keeper"] == 2
    # prefix is NOT a duplicate
    assert out.loc[4, "is_keeper"] == 1 and out.loc[4, "keeper"] == 4
    assert out.loc[1, "fp"] == out.loc[3, "fp"] == out.loc[5, "fp"]
    assert out.loc[2, "fp"] != out.loc[1, "fp"]


def test_conversation_dedup_ordering_tiebreak(ray_session):
    # same ts -> event_id breaks the tie; sequences differ only by that order
    rows = [
        (1, 10, 1, "x"), (1, 10, 2, "y"),
        (2, 10, 1, "y"), (2, 10, 2, "x"),
        (3, 10, 5, "x"), (3, 10, 9, "y"),  # same ordered content as u1
    ]
    out = (
        conversation_dedup(rd.from_pandas(_events(rows)))
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[3, "keeper"] == 1 and out.loc[3, "is_keeper"] == 0
    assert out.loc[2, "is_keeper"] == 1


def test_conversation_dedup_separator_injection(ray_session):
    # content containing the separator must not create false collisions:
    # ["a\x1fb"] vs ["a","b"] concat to the same bytes ONLY if sep leaks;
    # the default sep IS \x1f, so these two DO collide byte-wise — document
    # the contract: callers with \x1f in content pass a different sep.
    rows = [
        (1, 10, 1, "a\x1fb"),
        (2, 10, 1, "a"), (2, 20, 2, "b"),
    ]
    out = (
        conversation_dedup(rd.from_pandas(_events(rows)), sep="\x00sep\x00")
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "is_keeper"] == 1 and out.loc[2, "is_keeper"] == 1
    assert out.loc[1, "fp"] != out.loc[2, "fp"]
