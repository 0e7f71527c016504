"""LastWhere: most recent value of a column among rows satisfying a
condition, strictly before the current row, within entity partitions.

The agent-transcript feature family "state as of the previous matching
event": last tool call's name, timestamp of the last user turn ("time
since last user message" = ts - ts_last_where), last assistant text.

Semantics are ROW-level: the condition selects the event, and every
output column returns that SAME matched row's value — a null value AT
the matched row comes through as null. This differs from SQL
``last_value(CASE WHEN cond THEN col END IGNORE NULLS)`` only when a
matching row carries a null in some value column (IGNORE NULLS would
skip it per-column, silently mixing fields from DIFFERENT rows); the two
coincide whenever matched rows are non-null in the selected columns. No reference analog (nearest is DifferenceLag's
unconditional numeric delta, /root/reference/nvtabular/ops/
difference_lag.py:23-105).

Kernel (vectorized, dtype-preserving): rows arrive (key, sort)-ordered
from the fused bucketed exchange with change-point gids. Encode each
condition-matching row as ``gid * n + position`` — globally increasing
across the sorted groups — and take a single global cummax shifted by
one; a carry from a FOREIGN group decodes to a mismatched gid and is
masked null, so group resets need no segmented scan. One null-masked
``pc.take`` per value column fetches the matched rows' values, so
strings, timestamps and lists all work without a pandas round trip.

``cond_col`` must be a boolean column (build one upstream with LambdaOp
for arbitrary predicates); null condition counts as False (SQL CASE
parity).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class LastWhere(Operator):
    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        cond_col: str,
        sort_cols: Optional[Union[str, list[str]]] = None,
        include_current: bool = False,
        name_sep: str = "_",
    ):
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.cond_col = cond_col
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])
        self.include_current = include_current
        self.name_sep = name_sep

    @property
    def dependencies(self):
        deps = self.partition_cols + [
            c for c in self.sort_cols if c not in self.partition_cols
        ]
        if self.cond_col not in deps:
            deps.append(self.cond_col)
        return deps

    def output_dtype(self):
        return None  # passthrough

    def column_mapping(self, col_selector):
        return {
            f"{col}{self.name_sep}last_where": [col]
            for col in col_selector.names
            if col not in self.partition_cols and col != self.cond_col
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
        )

        value_cols = [
            c
            for c in col_selector.names
            if c not in self.partition_cols and c != self.cond_col
        ]
        n = table.num_rows
        gid = group_ids_sorted(table, self.partition_cols)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        cond = pc.fill_null(
            table.column(self.cond_col).combine_chunks().cast(pa.bool_()), False
        ).to_numpy(zero_copy_only=False)
        if order is not None:
            cond = cond[order]
        if n == 0:
            idx = pa.array([], pa.int64())
        else:
            pos = np.arange(n, dtype=np.int64)
            enc = np.where(cond, gid_k * n + pos, np.int64(-1))
            cm = np.maximum.accumulate(enc)
            if not self.include_current:
                cm = np.concatenate([[np.int64(-1)], cm[:-1]])
            src = cm % n  # position within the sorted view (valid rows only)
            valid = (cm >= 0) & (cm // n == gid_k)  # foreign-group carry -> null
            if order is not None:
                # src indexes the sorted view; map back to table positions
                src_tab = np.empty(n, np.int64)
                src_tab[order] = np.where(valid, order[np.clip(src, 0, n - 1)], -1)
                valid_tab = src_tab >= 0
            else:
                src_tab = np.where(valid, src, -1)
                valid_tab = valid
            idx = pa.array(np.clip(src_tab, 0, None), pa.int64(), mask=~valid_tab)
        out = {}
        for col in value_cols:
            arr = table.column(col).combine_chunks()
            out[f"{col}{self.name_sep}last_where"] = pc.take(arr, idx)
        return pa.table(out)
