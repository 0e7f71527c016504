"""JoinGroupby: per-category statistics of continuous columns over the fit
dataset, left-joined back onto each row.

Reference: /root/reference/nvtabular/ops/join_groupby.py:37-283. Output
naming: ``{group}_count`` and ``{group}_{cont}_{stat}``; dtype coercion
AGG_DTYPES (count->int32, mean/std/var->float32, join_groupby.py:29-34).

Ray design: fit = one map_batches pass computing per-batch grouped partials
(count, sum, sumsq, min, max — a map-side combine) then ONE small
``groupby(group).aggregate(Sum/Min/Max)`` shuffle; mean/std/var finalized on
the driver (same algebra as categorify.py:1090-1131). Transform = broadcast
join: the (small) stat table ships via ray.put once and each actor/task
merges per batch — no second shuffle (SURVEY.md §2.1 JoinGroupby row).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.ops.base import BroadcastTableState, StatOperator

AGG_DTYPES = {"count": np.int32, "std": np.float32, "var": np.float32, "mean": np.float32}
_SUPPORTED = ("count", "sum", "mean", "std", "var", "min", "max")


def _group_name(group, name_sep="_"):
    if isinstance(group, (list, tuple)):
        return name_sep.join(group)
    return group


def grouped_stats(ds, group_cols: list[str], cont_cols: list[str]) -> pd.DataFrame:
    """Distributed grouped (count,sum,sumsq,min,max) with map-side combine;
    returns the small merged stat frame on the driver."""
    from nvtabular_ray.functions.aggregates import grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(group_cols + cont_cols).to_pandas()
        for c in cont_cols:
            df[f"__{c}_sq__"] = df[c].astype("float64") ** 2
        g = df.groupby(group_cols, dropna=True, observed=True)
        out = g.size().rename("__count__").to_frame()
        for c in cont_cols:
            out[f"__{c}_sum__"] = g[c].sum()
            out[f"__{c}_sumsq__"] = g[f"__{c}_sq__"].sum()
            out[f"__{c}_min__"] = g[c].min()
            out[f"__{c}_max__"] = g[c].max()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    spec = {"__count__": "sum"}
    for c in cont_cols:
        spec[f"__{c}_sum__"] = "sum"
        spec[f"__{c}_sumsq__"] = "sum"
        spec[f"__{c}_min__"] = "min"
        spec[f"__{c}_max__"] = "max"
    return grouped_reduce(parts, group_cols, spec)


class JoinGroupby(BroadcastTableState, StatOperator):
    def __init__(
        self,
        cont_cols: Optional[list[str]] = None,
        stats=("count",),
        out_path: Optional[str] = None,
        name_sep: str = "_",
    ):
        StatOperator.__init__(self)
        self.cont_cols = list(cont_cols or [])
        for s in stats:
            if s not in _SUPPORTED:
                raise ValueError(f"unsupported stat {s}; supported: {_SUPPORTED}")
        self.stats = list(stats)
        self.out_path = out_path
        self.name_sep = name_sep
        self.state_tables: dict[str, pa.Table] = {}

    @property
    def dependencies(self):
        return self.cont_cols

    def _groups(self, col_selector) -> list[tuple[str, list[str]]]:
        out = []
        for g in col_selector.grouped_names:
            if isinstance(g, str):
                out.append((g, [g]))
            else:
                out.append((_group_name(g, self.name_sep), list(g)))
        return out

    def column_mapping(self, col_selector):
        mapping = {}
        for name, group in self._groups(col_selector):
            for stat in self.stats:
                if stat == "count":
                    mapping[f"{name}_count"] = list(group)
                else:
                    for cont in self.cont_cols:
                        mapping[f"{name}_{cont}_{stat}"] = [cont, *group]
        return mapping

    # -------------------------------------------------------------- fit --
    def fit(self, col_selector, ds) -> None:
        for name, group in self._groups(col_selector):
            raw = grouped_stats(ds, group, self.cont_cols)
            stat = raw[group].copy()
            cnt = raw["__count__"].astype("float64")
            if "count" in self.stats:
                stat[f"{name}_count"] = raw["__count__"].astype("int64")
            for c in self.cont_cols:
                s, sq = raw[f"__{c}_sum__"], raw[f"__{c}_sumsq__"]
                mean = s / cnt
                var = (sq - cnt * mean * mean) / (cnt - 1)
                var = var.clip(lower=0)
                for statname in self.stats:
                    if statname == "count":
                        continue
                    col = f"{name}_{c}_{statname}"
                    if statname == "sum":
                        stat[col] = s
                    elif statname == "mean":
                        stat[col] = mean
                    elif statname == "var":
                        stat[col] = var
                    elif statname == "std":
                        stat[col] = np.sqrt(var)
                    elif statname == "min":
                        stat[col] = raw[f"__{c}_min__"]
                    elif statname == "max":
                        stat[col] = raw[f"__{c}_max__"]
            self.state_tables[name] = pa.Table.from_pandas(stat, preserve_index=False)
        if self.out_path:
            import os

            import pyarrow.parquet as pq

            os.makedirs(self.out_path, exist_ok=True)
            for name, tab in self.state_tables.items():
                pq.write_table(tab, os.path.join(self.out_path, f"cat_stats.{name}.parquet"))

    def clear(self):
        super().clear()
        self.state_tables = {}
        self._refs = {}

    # -------------------------------------------------------- transform --
    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out_parts = []
        for name, group in self._groups(col_selector):
            stat = self.state_tables[name].to_pandas()
            left = table.select(group).to_pandas()
            merged = left.merge(stat, on=group, how="left")
            new_cols = [c for c in merged.columns if c not in group]
            part = merged[new_cols]
            for col in part.columns:
                for agg, dt in AGG_DTYPES.items():
                    if col.endswith(f"{self.name_sep}{agg}"):
                        part[col] = part[col].astype(dt)
            out_parts.append(pa.Table.from_pandas(part, preserve_index=False))
        cols = {}
        for t in out_parts:
            for cname in t.column_names:
                cols.setdefault(cname, t.column(cname))
        return pa.table(cols)
