"""DatePart: calendar feature extraction from timestamp columns.

The standard categorical time features (hour-of-day, day-of-week, month,
...) the reference leaves to hand-written LambdaOps. Pure Arrow temporal
kernels — one C call per part, no Python per row. Conventions match SQL
so every part has an exact DuckDB oracle:

    year/month/day/hour/minute/second : extract(part FROM ts)
    isodow                            : Monday=1 .. Sunday=7 (isodow)
    week                              : ISO week number
    dayofyear                         : 1-based ordinal day
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


class DatePart(Operator):
    output_tags = ["categorical"]

    def __init__(self, parts: Union[str, tuple, list] = ("hour", "isodow")):
        parts = [parts] if isinstance(parts, str) else list(parts)
        bad = [p for p in parts if p not in _PARTS]
        if bad:
            raise ValueError(f"unknown date parts {bad}; options: {sorted(_PARTS)}")
        self.parts = parts

    def output_dtype(self):
        return pa.int64()

    def column_mapping(self, col_selector):
        return {
            f"{col}_{p}": [col] for col in col_selector.names for p in self.parts
        }

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out = {}
        for col in col_selector.names:
            a = table.column(col)
            for p in self.parts:
                out[f"{col}_{p}"] = pc.cast(_PARTS[p](a), pa.int64())
        return pa.table(out)
