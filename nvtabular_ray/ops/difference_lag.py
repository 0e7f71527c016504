"""DifferenceLag: lag/lead deltas within entity partitions.

Reference: /root/reference/nvtabular/ops/difference_lag.py:23-105 —
``col - col.shift(k)`` masked to null at partition boundaries; negative
shift = lead; output ``{col}_difference_lag_{k}`` float32. The reference
requires pre-partitioned+pre-sorted input; in this engine the op declares
``partition_cols``/``sort_cols`` and the Workflow compiler runs the whole
DAG inside the bucketed key shuffle (pipelines/partitioned.py), so each
transform call sees entity-complete, (key, sort)-ordered rows and computes
grouped shifts vectorized (pandas groupby.shift across all entities at
once — boundary masking is implied by the groupby, no mask arithmetic).
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class DifferenceLag(Operator):
    output_tags = ["continuous"]

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
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])

    @property
    def dependencies(self):
        return self.partition_cols + [c for c in self.sort_cols if c not in self.partition_cols]

    def output_dtype(self):
        return pa.float32()

    def column_mapping(self, col_selector):
        return {
            f"{col}_difference_lag_{shift}": [col]
            for col in col_selector.names
            if col not in self.partition_cols and col not in self.sort_cols
            for shift in self.shifts
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
            grouped_diff,
        )

        value_cols = [
            c
            for c in col_selector.names
            if c not in self.partition_cols and c not in self.sort_cols
        ]
        gid = group_ids_sorted(table, self.partition_cols)
        # the fused bucket sort uses the UNION of all ops' sort columns
        # (first spec order wins) — enforce THIS op's in-group order when
        # another op's axis won the primary slot (O(n) check, sort only on
        # an actual violation)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        out = {}
        for col in value_cols:
            vals = (
                table.column(col)
                .combine_chunks()
                .cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            if order is not None:
                vals = vals[order]
            for shift in self.shifts:
                delta = grouped_diff(vals, gid_k, shift).astype(np.float32)
                if order is not None:
                    back = np.empty(len(delta), delta.dtype)
                    back[order] = delta
                    delta = back
                # boundary rows are NULL (reference masks with None,
                # difference_lag.py:74-78), not NaN
                out[f"{col}_difference_lag_{shift}"] = pa.array(
                    delta, pa.float32(), mask=np.isnan(delta)
                )
        return pa.table(out)
