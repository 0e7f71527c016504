"""DatePart: calendar feature extraction from timestamp columns.

The standard categorical time features (hour-of-day, day-of-week, month,
...) the reference leaves to hand-written LambdaOps. Pure Arrow temporal
kernels — one C call per part, no Python per row. Conventions match SQL
so every part has an exact DuckDB oracle:

    year/month/day/hour/minute/second : extract(part FROM ts)
    isodow                            : Monday=1 .. Sunday=7 (isodow)
    week                              : ISO week number
    dayofyear                         : 1-based ordinal day

``cyclical=True`` additionally emits ``{col}_{part}_sin`` / ``_cos``
continuous encodings (phase = 2*pi * (part - offset) / period — hour 23
sits next to hour 0, the standard NN trick for periodic features).
"""

from __future__ import annotations

from typing import Union

import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.ops.base import Operator

_PARTS = {
    "year": lambda a: pc.year(a),
    "month": lambda a: pc.month(a),
    "day": lambda a: pc.day(a),
    "hour": lambda a: pc.hour(a),
    "minute": lambda a: pc.minute(a),
    "second": lambda a: pc.second(a),
    # Monday=1..Sunday=7, SQL isodow parity
    "isodow": lambda a: pc.day_of_week(
        a, options=pc.DayOfWeekOptions(count_from_zero=False, week_start=1)
    ),
    "week": lambda a: pc.iso_week(a),
    "dayofyear": lambda a: pc.day_of_year(a),
}


# cyclical period per part (sin/cos continuous encodings; 0-based phase)
_PERIODS = {
    "month": (12, 1),       # (period, offset subtracted to make 0-based)
    "day": (31, 1),
    "hour": (24, 0),
    "minute": (60, 0),
    "second": (60, 0),
    "isodow": (7, 1),
    "dayofyear": (366, 1),
}


class DatePart(Operator):
    output_tags = ["categorical"]

    def __init__(
        self,
        parts: Union[str, tuple, list] = ("hour", "isodow"),
        cyclical: bool = False,
    ):
        parts = [parts] if isinstance(parts, str) else list(parts)
        bad = [p for p in parts if p not in _PARTS]
        if bad:
            raise ValueError(f"unknown date parts {bad}; options: {sorted(_PARTS)}")
        if cyclical:
            nocyc = [p for p in parts if p not in _PERIODS]
            if nocyc:
                raise ValueError(
                    f"no cyclical period for {nocyc}; options: {sorted(_PERIODS)}"
                )
        self.parts = parts
        self.cyclical = cyclical

    def output_dtype(self):
        return None  # int64 parts; float64 sin/cos (compute_output_schema)

    def column_mapping(self, col_selector):
        out = {}
        for col in col_selector.names:
            for p in self.parts:
                out[f"{col}_{p}"] = [col]
                if self.cyclical:
                    out[f"{col}_{p}_sin"] = [col]
                    out[f"{col}_{p}_cos"] = [col]
        return out

    def compute_output_schema(self, col_selector, input_schema):
        out = {}
        for col in col_selector.names:
            for p in self.parts:
                out[f"{col}_{p}"] = pa.int64()
                if self.cyclical:
                    out[f"{col}_{p}_sin"] = pa.float64()
                    out[f"{col}_{p}_cos"] = pa.float64()
        return out

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        import numpy as np

        out = {}
        for col in col_selector.names:
            a = table.column(col)
            for p in self.parts:
                part = pc.cast(_PARTS[p](a), pa.int64())
                out[f"{col}_{p}"] = part
                if self.cyclical:
                    period, off = _PERIODS[p]
                    v = part.to_numpy(zero_copy_only=False).astype(np.float64)
                    phase = (v - off) * (2.0 * np.pi / period)
                    out[f"{col}_{p}_sin"] = pa.array(
                        np.sin(phase), pa.float64(), from_pandas=True
                    )
                    out[f"{col}_{p}_cos"] = pa.array(
                        np.cos(phase), pa.float64(), from_pandas=True
                    )
        return pa.table(out)
