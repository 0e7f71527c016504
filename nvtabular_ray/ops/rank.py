"""GroupRank: per-entity rank features (row_number / dense_rank).

The "position of this turn within its conversation" feature — SQL
``row_number() / dense_rank() OVER (PARTITION BY entity ORDER BY ...)``.
NEW SCOPE vs the reference (its Groupby aggregates entities away,
/root/reference/nvtabular/ops/groupby.py:30; nothing emits a per-row rank).
Fuses into the workflow's single bucketed (entity, ts) shuffle alongside
the other ordered ops; the kernel is one arange minus segment starts
(row_number) or a change-point cumsum (dense_rank) over key-sorted arrays.

``method="row_number"``: 1-based position under the ``sort_cols`` total
order — pass a unique tie-breaker for determinism, exactly as in SQL.
``method="dense_rank"``: ties (equal sort tuple) share a rank and ranks are
gapless; determinism needs no tie-breaker.
``method="percent_rank"``: ``(row_number - 1) / (group_size - 1)`` float64
(single-row group -> 0.0, SQL parity) — the small-integer ratio is
bit-identical across engines, so it hash-compares without rounding.
``method="ntile"``: SQL ``NTILE(n)`` — n near-equal ordered tiles per
group, larger tiles first (pass ``n=...``).
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.ops.base import Operator


def rank_from_positions(rn: np.ndarray, size: np.ndarray, method: str, n: int | None = None):
    """Rank features from 1-based in-entity positions + entity sizes —
    shared by the op and the hot-split carry path (where ``rn`` includes
    the rows_before carry and ``size`` is the entity's TOTAL rows)."""
    if method == "row_number":
        return rn
    if method == "percent_rank":
        return np.where(size > 1, (rn - 1) / np.maximum(size - 1, 1), 0.0)
    # SQL NTILE: base rows per tile = size // n, first size % n tiles fat
    base, extra = size // n, size % n
    pos = rn - 1
    cut = (base + 1) * extra
    return np.where(
        pos < cut,
        pos // np.maximum(base + 1, 1),
        extra + (pos - cut) // np.maximum(base, 1),
    ) + 1


class GroupRank(Operator):
    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        sort_cols: Union[str, list[str]],
        method: str = "row_number",
        out_col: str | None = None,
        n: int | None = None,
    ):
        if method not in ("row_number", "dense_rank", "percent_rank", "ntile"):
            raise ValueError(
                f"method must be row_number|dense_rank|percent_rank|ntile, got {method!r}"
            )
        if method == "ntile":
            if not n or n < 1:
                raise ValueError("ntile needs n >= 1")
            self.n = int(n)
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        if not self.sort_cols:
            raise ValueError("GroupRank needs at least one sort column")
        self.method = method
        self.out_col = out_col or method

    @property
    def dependencies(self):
        return self.partition_cols + [c for c in self.sort_cols if c not in self.partition_cols]

    def column_mapping(self, col_selector):
        return {self.out_col: list(self.sort_cols)}

    def output_dtype(self):
        return pa.float64() if self.method == "percent_rank" else pa.int64()

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
            group_starts,
        )

        n = table.num_rows
        if n == 0:
            return pa.table({self.out_col: pa.array([], self.output_dtype())})
        gid = group_ids_sorted(table, self.partition_cols)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        starts = group_starts(gid_k)
        counts = np.diff(np.r_[starts, n])
        gstart = np.repeat(starts, counts)
        if self.method in ("row_number", "percent_rank", "ntile"):
            rn = np.arange(n, dtype=np.int64) - gstart + 1
            rank = rank_from_positions(
                rn, np.repeat(counts, counts), self.method, getattr(self, "n", None)
            )
        else:
            # dense: new rank where the sort tuple changes within the group
            change = np.zeros(n, dtype=bool)
            for c in self.sort_cols:
                col = table.column(c).combine_chunks()
                if order is not None:
                    col = col.take(pa.array(order))
                neq = pc.fill_null(pc.not_equal(col.slice(1), col.slice(0, n - 1)), False)
                change[1:] |= neq.to_numpy(zero_copy_only=False).astype(bool)
                va = pc.is_valid(col.slice(1)).to_numpy(zero_copy_only=False)
                vb = pc.is_valid(col.slice(0, n - 1)).to_numpy(zero_copy_only=False)
                change[1:] |= va != vb
            change[starts] = False
            cum = np.cumsum(change.astype(np.float64)).astype(np.int64)
            rank = cum - cum[gstart] + 1
        out_np = np.float64 if self.method == "percent_rank" else np.int64
        rank = rank.astype(out_np, copy=False)
        if order is not None:
            back = np.empty(n, out_np)
            back[order] = rank
            rank = back
        return pa.table({self.out_col: pa.array(rank)})
