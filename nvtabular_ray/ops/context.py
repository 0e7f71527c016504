"""ContextConcat: assemble each turn's model context from transcript history.

For every row, the concatenation (oldest first) of the previous ``k`` rows'
text within the same entity — "the last k turns of this conversation", the
string a trainer feeds a model as context for the current turn. Strictly
previous rows only: the current row is excluded, so the feature is
leakage-free by construction (SQL ``ROWS BETWEEN k PRECEDING AND 1
PRECEDING``). NEW SCOPE vs the reference (north-rule transcript mandate);
the closest reference analog is Groupby's ``"list"`` aggregation
(/root/reference/nvtabular/ops/groupby.py:90-103) which collects whole
columns per entity rather than a per-row trailing window.

Semantics (SQL ``string_agg`` parity):

- frame = the up-to-k rows immediately before the row within its entity,
  under the total order given by ``sort_cols`` (pass a unique tie-breaker
  for determinism — ROWS frames are order-sensitive);
- null text values inside the frame are skipped;
- an empty frame (first row of an entity) or an all-null frame yields NULL;
- with ``prefix_col`` each piece is rendered ``f"{prefix}{prefix_sep}{text}"``
  (``prefix || sep || text`` — NULL if either side is NULL, SQL ``||``
  parity), e.g. ``role: text`` transcript rendering.

Implementation is Arrow-vectorized: k shifted ``Array.take`` gathers (null
where the shift crosses an entity boundary) joined by ONE
``pc.binary_join_element_wise(..., null_handling="skip")`` C call — no
per-row Python. Fuses into the workflow's single bucketed (entity, ts)
shuffle alongside the other ordered ops.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.ops.base import Operator


def render_pieces(table: pa.Table, col: str, prefix_col, prefix_sep: str):
    """The rendered per-row piece: the text column as string, optionally
    ``prefix || prefix_sep || text`` (NULL if either side is NULL — SQL
    ``||`` parity). Shared by the op and the hot-split carry path so the
    rendering can never diverge."""
    txt = table.column(col).combine_chunks()
    if not (pa.types.is_string(txt.type) or pa.types.is_large_string(txt.type)):
        txt = pc.cast(txt, pa.string())
    if prefix_col is not None:
        prefix = table.column(prefix_col).combine_chunks()
        if not (pa.types.is_string(prefix.type) or pa.types.is_large_string(prefix.type)):
            prefix = pc.cast(prefix, pa.string())
        txt = pc.binary_join_element_wise(
            prefix.cast(txt.type), txt, pa.scalar(prefix_sep, txt.type)
        )
    return txt


def concat_prev_k(txt, gstart: np.ndarray, k: int, sep: str):
    """Previous-k skip-join kernel over a key-sorted piece array: for each
    row, the ``sep``-join (oldest first) of the up-to-``k`` non-null pieces
    before it within [gstart[i], i); empty/all-null frame -> NULL. One
    ``binary_join_element_wise`` C call; works around the pyarrow<=16 bug
    where the skip-join kernel DROPS rows whose pieces are all null."""
    n = len(txt)
    idx = np.arange(n, dtype=np.int64)
    valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
    cv = np.concatenate([[0], np.cumsum(valid, dtype=np.int64)])
    lo = np.maximum(gstart, idx - k)
    has_piece = pa.array((cv[idx] - cv[lo]) > 0)
    pieces = []
    for j in range(k, 0, -1):  # oldest first
        src = idx - j
        ok = src >= gstart
        pieces.append(txt.take(pa.array(np.where(ok, src, 0), mask=~ok)))
    pieces.append(pc.if_else(has_piece, pa.scalar(None, txt.type), pa.scalar("", txt.type)))
    joined = pc.binary_join_element_wise(
        *pieces, pa.scalar(sep, txt.type), null_handling="skip"
    )
    return pc.if_else(has_piece, joined, pa.scalar(None, txt.type))


def concat_budget(txt, gstart: np.ndarray, ntok: np.ndarray, budget: int, sep: str,
                  k: int | None = None):
    """Variable-frame skip-join: for each row, the ``sep``-join (oldest
    first) of the non-null pieces in the LONGEST suffix of its entity's
    earlier rows whose ``ntok`` total is <= ``budget`` (optionally capped
    at ``k`` rows) — "as many most-recent turns as fit the token budget".
    Window start via ONE searchsorted on the group-normalized cumulative
    token axis (counts are non-negative so the prefix is monotone within
    a group); the gather is built from valid-row offsets, then ONE
    ``pc.binary_join`` per batch. Empty/all-null frame -> NULL."""
    n = len(txt)
    idx = np.arange(n, dtype=np.int64)
    ntok = np.maximum(ntok.astype(np.int64, copy=False), 0)
    c = np.cumsum(ntok, dtype=np.int64)
    prev = c - ntok  # tokens before this row, global
    base = prev - prev[gstart]  # group-local, monotone within the group
    max_rel = int(base.max()) if n else 0
    stride = max_rel + int(budget) + 2
    gid = np.zeros(n, np.int64)
    if n:
        is_start = np.zeros(n, bool)
        is_start[np.unique(gstart)] = True
        gid = np.cumsum(is_start) - 1
    axis = base + gid * stride
    s = np.searchsorted(axis, axis - budget, side="left")
    s = np.maximum(s, gstart)
    if k is not None:
        s = np.maximum(s, idx - int(k))
    valid = pc.is_valid(txt).to_numpy(zero_copy_only=False)
    V = np.flatnonzero(valid)
    lo = np.searchsorted(V, s)
    hi = np.searchsorted(V, idx)
    cnt = hi - lo
    total = int(cnt.sum())
    if total:
        # gather = concat of V[lo_i:hi_i] per row, oldest first
        cum = np.concatenate([[0], np.cumsum(cnt)])
        inner = np.arange(total, dtype=np.int64) - np.repeat(
            cum[:-1].astype(np.float64), cnt
        ).astype(np.int64)
        gather = V[np.repeat(lo.astype(np.float64), cnt).astype(np.int64) + inner]
        pieces = txt.take(pa.array(gather))
    else:
        pieces = txt.slice(0, 0)
    offsets = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
    lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pieces)
    joined = pc.binary_join(lst, pa.scalar(sep, txt.type))
    return pc.if_else(pa.array(cnt > 0), joined, pa.scalar(None, txt.type))


class ContextConcat(Operator):
    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        k: Optional[int] = 3,
        sort_cols: Optional[Union[str, list[str]]] = None,
        sep: str = "\n",
        prefix_col: Optional[str] = None,
        prefix_sep: str = ": ",
        out_suffix: Optional[str] = None,
        budget: Optional[int] = None,
        budget_col: Optional[str] = None,
    ):
        if budget is not None:
            # token-budget mode: frame = longest suffix of earlier rows
            # whose budget_col total fits, optionally still capped at k rows
            if budget_col is None:
                raise ValueError("budget mode needs budget_col (per-row token counts)")
            if budget < 0:
                raise ValueError(f"budget must be >= 0, got {budget}")
        elif k is None or k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.k = None if k is None else int(k)
        self.budget = None if budget is None else int(budget)
        self.budget_col = budget_col
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])
        self.sep = sep
        self.prefix_col = prefix_col
        self.prefix_sep = prefix_sep
        self.out_suffix = out_suffix or (
            f"ctxb{self.budget}" if self.budget is not None else f"ctx{self.k}"
        )

    @property
    def dependencies(self):
        extra = [c for c in self.sort_cols if c not in self.partition_cols]
        for c in (self.prefix_col, self.budget_col):
            if c and c not in self.partition_cols + extra:
                extra = extra + [c]
        return self.partition_cols + extra

    def _value_cols(self, col_selector):
        skip = (
            set(self.partition_cols) | set(self.sort_cols)
            | {self.prefix_col, self.budget_col}
        )
        return [c for c in col_selector.names if c not in skip]

    def column_mapping(self, col_selector):
        return {f"{c}_{self.out_suffix}": [c] for c in self._value_cols(col_selector)}

    def compute_output_schema(self, col_selector, input_schema):
        out = {}
        for out_col, (src,) in self.column_mapping(col_selector).items():
            t = input_schema.get(src)
            out[out_col] = t if t is not None and pa.types.is_large_string(t) else pa.string()
        return out

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
            group_starts,
        )

        n = table.num_rows
        value_cols = self._value_cols(col_selector)
        if n == 0:
            # type must match non-empty batches (large_string passthrough)
            # or blocks of one Dataset diverge in schema
            def _t(c):
                t = table.schema.field(c).type
                return t if pa.types.is_large_string(t) else pa.string()

            return pa.table(
                {f"{c}_{self.out_suffix}": pa.array([], _t(c)) for c in value_cols}
            )
        gid = group_ids_sorted(table, self.partition_cols)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        order_idx = None if order is None else pa.array(order)
        inv_idx = None
        if order is not None:
            inv = np.empty(n, np.int64)
            inv[order] = np.arange(n, dtype=np.int64)
            inv_idx = pa.array(inv)

        starts = group_starts(gid_k)
        counts = np.diff(np.r_[starts, n])
        gstart = np.repeat(starts, counts)

        ntok = None
        if self.budget is not None:
            ntok = (
                pc.fill_null(table.column(self.budget_col).combine_chunks(), 0)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
            if order is not None:
                ntok = ntok[order]

        out = {}
        for c in value_cols:
            txt = render_pieces(table, c, self.prefix_col, self.prefix_sep)
            if order_idx is not None:
                txt = txt.take(order_idx)
            if self.budget is not None:
                joined = concat_budget(txt, gstart, ntok, self.budget, self.sep, self.k)
            else:
                joined = concat_prev_k(txt, gstart, self.k, self.sep)
            if inv_idx is not None:
                joined = joined.take(inv_idx)
            out[f"{c}_{self.out_suffix}"] = joined
        return pa.table(out)
