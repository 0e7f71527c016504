"""Ewma: exponentially weighted moving average per entity (trailing,
includes the current row) — the classic smoothed-history feature
("recent average latency", "smoothed turn length") that plain RollingAgg
windows can't express.

    adjust=False (default):  y_t = (1 - alpha) * y_{t-1} + alpha * x_t
    adjust=True:             y_t = sum_j (1-alpha)^(t-j) x_j
                                   / sum_j (1-alpha)^(t-j)

No reference analog. SQL parity (driver oracle): a RECURSIVE CTE over
the per-entity row_number applying the identical double-precision
recurrence, so both sides agree to the _round6i integer compare.

Kernel: rows arrive (key, sort)-ordered from the fused bucketed
exchange; the whole bucket runs through pandas' Cython
``groupby().ewm().mean()`` in ONE call (input is gid-sorted, so the
grouped concatenation order equals row order — no reindex). NaN inputs
follow pandas semantics: skipped in the weighting, output carries the
running mean forward.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class Ewma(Operator):
    output_tags = ["continuous"]

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        alpha: float,
        sort_cols: Optional[Union[str, list[str]]] = None,
        adjust: bool = False,
    ):
        if not (0.0 < alpha <= 1.0):
            raise ValueError("alpha must be in (0, 1]")
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.alpha = float(alpha)
        self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols or [])
        self.adjust = adjust

    @property
    def dependencies(self):
        return self.partition_cols + [c for c in self.sort_cols if c not in self.partition_cols]

    def output_dtype(self):
        return pa.float64()

    def column_mapping(self, col_selector):
        return {
            f"{col}_ewma": [col]
            for col in col_selector.names
            if col not in self.partition_cols and col not in self.sort_cols
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        from nvtabular_ray.functions.grouped_np import (
            group_ids_sorted,
            group_multi_order,
        )

        value_cols = [
            c
            for c in col_selector.names
            if c not in self.partition_cols and c not in self.sort_cols
        ]
        n = table.num_rows
        gid = group_ids_sorted(table, self.partition_cols)
        order = group_multi_order(table, gid, self.sort_cols)
        gid_k = gid if order is None else gid[order]
        gser = pd.Series(gid_k)
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
            if n == 0:
                ew = vals
            else:
                # gid-sorted input: grouped concat order == row order
                ew = (
                    pd.Series(vals)
                    .groupby(gser)
                    .ewm(alpha=self.alpha, adjust=self.adjust)
                    .mean()
                    .to_numpy()
                )
            if order is not None:
                back = np.empty(n, np.float64)
                back[order] = ew
                ew = back
            out[f"{col}_ewma"] = pa.array(ew, pa.float64(), from_pandas=True)
        return pa.table(out)
