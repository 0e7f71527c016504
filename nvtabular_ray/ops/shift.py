"""Shift: raw lag/lead of ANY column within entity partitions, dtype-
preserving ("previous role", "previous tool", "next ts", ...).

The reference has no raw-shift operator — its DifferenceLag
(/root/reference/nvtabular/ops/difference_lag.py:23-105) is the numeric
DELTA ``col - col.shift(k)``; categorical/temporal history features need
the shifted VALUE itself. Same partitioned contract as DifferenceLag: the
op declares ``partition_cols``/``sort_cols`` and the Workflow compiler
runs it inside the single bucketed key shuffle, so transform sees
entity-complete (key, sort)-ordered rows.

Kernel: one arange-offset index per shift with boundary rows masked null
(index valid iff it stays inside the row's group — change-point gids make
that a single vectorized compare), then ONE ``pc.take`` with a
null-masked index array — Arrow emits null at null indices, so strings,
timestamps, lists and nested types all shift without a pandas round trip
or dtype change. SQL parity: ``lag(col, k) OVER (PARTITION BY entity
ORDER BY sort)`` (lead for negative k).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class Shift(Operator):
    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        shift: Union[int, list[int]] = 1,
        sort_cols: Optional[Union[str, list[str]]] = None,
    ):
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.shifts = [shift] if isinstance(shift, int) else list(shift)
        if any(s == 0 for s in self.shifts):
            raise ValueError("shift=0 is the identity; use the column directly")
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])

    @property
    def dependencies(self):
        return self.partition_cols + [c for c in self.sort_cols if c not in self.partition_cols]

    def output_dtype(self):
        return None  # passthrough: shifted column keeps its input dtype

    def column_mapping(self, col_selector):
        # sort columns are NOT excluded: "previous ts" is a legitimate
        # history feature (unlike DifferenceLag, where diffing the sort
        # axis is excluded); only the partition key itself is constant
        # within a group and therefore meaningless to shift
        return {
            f"{col}_shift_{shift}": [col]
            for col in col_selector.names
            if col not in self.partition_cols
            for shift in self.shifts
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
        )

        value_cols = [c for c in col_selector.names if c not in self.partition_cols]
        n = table.num_rows
        gid = group_ids_sorted(table, self.partition_cols)
        # enforce THIS op's in-group order when another fused op's sort
        # axis won the primary slot (same contract as DifferenceLag)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        rows = np.arange(n, dtype=np.int64)
        out = {}
        idx_cache: dict[int, pa.Array] = {}
        for shift in self.shifts:
            src = rows - shift  # shift>0 lag, shift<0 lead
            inside = (src >= 0) & (src < n)
            valid = inside & (gid_k[np.clip(src, 0, n - 1)] == gid_k)
            if order is not None:
                # src indexes the SORTED view; map back to table positions
                src_tab = np.empty(n, np.int64)
                src_tab[order] = np.where(valid, order[np.clip(src, 0, n - 1)], -1)
                valid_tab = src_tab >= 0
            else:
                src_tab = np.where(valid, src, -1)
                valid_tab = valid
            idx_cache[shift] = pa.array(
                np.clip(src_tab, 0, None), pa.int64(), mask=~valid_tab
            )
        for col in value_cols:
            arr = table.column(col).combine_chunks()
            for shift in self.shifts:
                out[f"{col}_shift_{shift}"] = pc.take(arr, idx_cache[shift])
        return pa.table(out)
