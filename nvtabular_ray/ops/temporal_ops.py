"""Partitioned temporal ops: Sessionize and RollingAgg.

Op-form of pipelines/temporal.py so they FUSE into the workflow's single
bucketed key shuffle alongside DifferenceLag/Categorify/etc. — one shuffle
for the whole ordered feature set instead of one per op. NEW SCOPE vs the
reference (north rule: sessionization + windowed features); ordering
guarantees come from the workflow compiler (ops/base.py partition_cols).
"""

from __future__ import annotations

from typing import Optional, Union

import pandas as pd
import pyarrow as pa

from nvtabular_ray.ops.base import Operator


class Sessionize(Operator):
    """0-based per-entity session index; new session when the time since the
    previous row of the same entity exceeds ``gap`` seconds. Leakage-free:
    depends only on current/earlier rows of the entity."""

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        ts_col: str,
        gap: float,
        out_col: str = "session_id",
    ):
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.ts_col = ts_col
        self.gap = gap
        self.out_col = out_col
        self.sort_cols = [ts_col]

    @property
    def dependencies(self):
        return self.partition_cols + [self.ts_col]

    def column_mapping(self, col_selector):
        return {self.out_col: [self.ts_col]}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        df = table.select(self.partition_cols + [self.ts_col]).to_pandas()
        gap_td = pd.Timedelta(seconds=self.gap)
        delta = df.groupby(self.partition_cols, sort=False, observed=True)[self.ts_col].diff()
        if not hasattr(delta.iloc[0] if len(delta) else None, "total_seconds") and delta.dtype.kind in "if":
            new_session = (delta > self.gap) | delta.isna()
        else:
            new_session = (delta > gap_td) | delta.isna()
        session = (
            new_session.groupby([df[k] for k in self.partition_cols], observed=True)
            .cumsum()
            .astype("int64")
            - 1
        )
        return pa.table({self.out_col: pa.Array.from_pandas(session)})


class RollingAgg(Operator):
    """Trailing time-window aggregates per entity: for each row, aggregate
    the selected columns over rows of the same entity in (ts - window, ts].
    Past-only (zero temporal leakage). Output ``{col}_w{window}s_{agg}``."""

    def __init__(
        self,
        partition_cols: Union[str, list[str]],
        ts_col: str,
        window_seconds: float,
        aggs=("count", "sum", "mean"),
    ):
        self.partition_cols = (
            [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
        )
        self.ts_col = ts_col
        self.window_seconds = window_seconds
        self.aggs = list(aggs)
        self.sort_cols = [ts_col]

    @property
    def dependencies(self):
        return self.partition_cols + [self.ts_col]

    def _out_name(self, col: str, agg: str) -> str:
        return f"{col}_w{int(self.window_seconds)}s_{agg}"

    def column_mapping(self, col_selector):
        value_cols = [
            c
            for c in col_selector.names
            if c not in self.partition_cols and c != self.ts_col
        ]
        return {self._out_name(c, a): [c] for c in value_cols for a in self.aggs}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        value_cols = [
            c
            for c in col_selector.names
            if c not in self.partition_cols and c != self.ts_col
        ]
        df = table.select(self.partition_cols + [self.ts_col] + value_cols).to_pandas()
        window = pd.Timedelta(seconds=self.window_seconds)
        g = df.groupby(self.partition_cols, sort=False, observed=True, group_keys=False)
        out = {}
        for c in value_cols:
            rolled = g.rolling(window, on=self.ts_col, closed="right")[c].agg(self.aggs)
            rolled = rolled.reset_index(drop=True)
            for a in self.aggs:
                series = rolled[a] if isinstance(rolled, pd.DataFrame) else rolled
                series = series.astype("int64") if a == "count" else series.astype("float64")
                out[self._out_name(c, a)] = pa.Array.from_pandas(series)
        return pa.table(out)
