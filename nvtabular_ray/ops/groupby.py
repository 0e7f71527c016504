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

from nvtabular_ray.arrow_utils import dataset_arrow_schema

from nvtabular_ray.ops.base import Operator

_LIST_AGGS = ("list", "first", "last", "concat")
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
        concat_sep: str = " ",
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
        # "concat" agg: in-group-order string_agg (turns -> conversation
        # document). SQL parity: null values skipped, all-null/empty -> NULL
        self.concat_sep = concat_sep

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
    _ALGEBRAIC = ("sum", "count", "mean", "std", "var", "min", "max")

    def _all_algebraic(self, agg_dict) -> bool:
        return all(a in self._ALGEBRAIC for aggs in agg_dict.values() for a in aggs)

    def apply_dataset(self, col_selector, ds):
        agg_dict = self._agg_dict(col_selector)
        # Skew-proof path: purely algebraic aggs never need entity-complete
        # groups — each batch pre-aggregates to <= #distinct-keys rows
        # (map-side combine), so a hot key contributes ONE row per input
        # block to the merge shuffle instead of all its rows. This is the
        # salted-key mitigation SURVEY.md §7.4.4 calls for, done one better
        # (no explicit salt column needed).
        if self._all_algebraic(agg_dict) and not self.sort_cols:
            schema = dataset_arrow_schema(ds)
            types = dict(zip(schema.names, schema.types))
            if all(
                pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
                for c in agg_dict
            ):
                return self._apply_algebraic(agg_dict, ds)
        return self._apply_bucketed(agg_dict, ds)

    def _apply_algebraic(self, agg_dict, ds):
        import pyarrow.compute as pc

        keys = self.groupby_cols
        name_sep = self.name_sep

        def partial(t: pa.Table) -> pa.Table:
            # arrow group_by, not pandas (NUL-exact string keys; see
            # functions/aggregates.py note). pandas dropna=True groupby
            # semantics: null/NaN-key rows drop (arrow group_by would keep
            # them as a group, diverging from the bucketed/pandas paths)
            mask = None
            for k in keys:
                valid = pc.invert(pc.is_null(t.column(k), nan_is_null=True))
                mask = valid if mask is None else pc.and_(mask, valid)
            t = t.filter(mask)
            sel = t
            batch_aggs = []
            ren = {}
            for col in agg_dict:
                v = pc.cast(t.column(col), pa.float64())
                sel = sel.append_column(f"__{col}_sq__", pc.multiply(v, v))
                batch_aggs += [
                    (col, "count"),
                    (col, "sum"),
                    (f"__{col}_sq__", "sum"),
                    (col, "min"),
                    (col, "max"),
                ]
                ren.update(
                    {
                        f"{col}_count": f"__{col}_cnt__",
                        f"{col}_sum": f"__{col}_sum__",
                        f"__{col}_sq___sum": f"__{col}_sumsq__",
                        f"{col}_min": f"__{col}_min__",
                        f"{col}_max": f"__{col}_max__",
                    }
                )
            # keys are null-free here (mask filter above) so this
            # short-circuits; null-safe routing guards against pyarrow 16.1's
            # multi-key null-group bug if the dropna semantics ever change
            from nvtabular_ray.arrow_utils import null_safe_group_by

            res = null_safe_group_by(sel, keys, batch_aggs)
            return res.rename_columns([ren.get(n, n) for n in res.column_names])

        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        agg_spec = {}
        for col in agg_dict:
            agg_spec.update(
                {
                    f"__{col}_cnt__": "sum",
                    f"__{col}_sum__": "sum",
                    f"__{col}_sumsq__": "sum",
                    f"__{col}_min__": "min",
                    f"__{col}_max__": "max",
                }
            )
        # task-based hash exchange merge of the per-block partials (not
        # Ray's sort groupby; see aggregates.bucketed_aggregate)
        merged = bucketed_aggregate(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys,
            agg_spec,
            names="keep",
        )

        def finalize(t: pa.Table) -> pa.Table:
            out = {k: t.column(k) for k in keys}
            for col, col_aggs in agg_dict.items():
                cnt = t.column(f"__{col}_cnt__").cast(pa.float64())
                # pandas-parity sum of an all-null group is 0.0 (min_count=0)
                # — the arrow partial left it null, and the bucketed/serving
                # paths already emit 0.0 for the same input
                s = pc.fill_null(t.column(f"__{col}_sum__").cast(pa.float64()), 0.0)
                sq = pc.fill_null(t.column(f"__{col}_sumsq__").cast(pa.float64()), 0.0)
                mean = pc.divide(s, cnt)
                var = pc.divide(
                    pc.subtract(sq, pc.multiply(cnt, pc.multiply(mean, mean))),
                    pc.subtract(cnt, pa.scalar(1.0)),
                )
                var = pc.max_element_wise(var, pa.scalar(0.0))
                for a in col_aggs:
                    name = f"{col}{self.name_sep}{a}"
                    if a == "count":
                        out[name] = t.column(f"__{col}_cnt__").cast(pa.int32())
                    elif a == "sum":
                        out[name] = pc.cast(s, pa.float32())
                    elif a == "mean":
                        out[name] = pc.cast(mean, pa.float32())
                    elif a == "var":
                        out[name] = pc.cast(var, pa.float32())
                    elif a == "std":
                        out[name] = pc.cast(pc.sqrt(var), pa.float32())
                    elif a == "min":
                        out[name] = t.column(f"__{col}_min__")
                    elif a == "max":
                        out[name] = t.column(f"__{col}_max__")
            return pa.table(out)

        return merged.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)

    def _aggregate_table(self, agg_dict, t: pa.Table) -> pa.Table:
        """Key-complete single-table aggregate. Shared by the bucketed
        Dataset stage (one call per exchange bucket) and the in-process
        serving path (``apply_batch``). Dispatches to the Arrow/numpy
        change-point kernel; only exact ``median`` (no Arrow kernel — only
        approximate_median exists) falls back to the pandas path."""
        has_median = any("median" in aggs for aggs in agg_dict.values())
        if not has_median:
            return self._aggregate_table_arrow(agg_dict, t)
        return self._aggregate_table_pandas(agg_dict, t)

    def _aggregate_table_arrow(self, agg_dict, t: pa.Table) -> pa.Table:
        """Arrow-native aggregate: one sort_by, change-point group ids from
        dictionary indices (NUL-exact string equality), list/first/last as
        zero-copy offset slices / takes, conventional aggs via ONE arrow
        group_by on the int gid — no pandas round-trip of the bucket."""
        import pyarrow.compute as pc

        keys = self.groupby_cols
        sort_keys = self.sort_cols
        name_sep = self.name_sep
        # pandas dropna=True groupby semantics: drop null-key rows —
        # nan_is_null so float NaN keys drop too, matching the pandas branch
        mask = None
        for k in keys:
            valid = pc.invert(pc.is_null(t.column(k), nan_is_null=True))
            mask = valid if mask is None else pc.and_(mask, valid)
        t = t.filter(mask)
        order = [(k, "ascending") for k in keys] + [
            (c, "ascending" if self.ascending else "descending") for c in sort_keys
        ]
        t = t.combine_chunks().sort_by(order)
        n = t.num_rows
        change = np.zeros(n, dtype=bool)
        if n:
            change[0] = True
        for k in keys:
            arr = t.column(k).combine_chunks()
            if not pa.types.is_dictionary(arr.type):
                arr = pc.dictionary_encode(arr)
            idx = arr.indices.to_numpy(zero_copy_only=False)
            change[1:] |= idx[1:] != idx[:-1]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], n] if len(starts) else starts
        gid = np.cumsum(change) - 1
        starts_pa = pa.array(starts)
        pieces = {k: t.column(k).combine_chunks().take(starts_pa) for k in keys}
        conv: list[tuple] = []
        for col, col_aggs in agg_dict.items():
            arr = t.column(col).combine_chunks()
            for a in col_aggs:
                out_name = f"{col}{name_sep}{a}"
                if a == "list":
                    # group offsets ARE the list offsets over the sorted rows
                    pieces[out_name] = pa.ListArray.from_arrays(
                        pa.array(np.r_[starts, n], pa.int32()), arr
                    )
                elif a == "concat":
                    vals = arr
                    if not (
                        pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type)
                    ):
                        vals = pc.cast(vals, pa.string())
                    valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
                    cv = np.concatenate([[0], np.cumsum(valid, dtype=np.int64)])
                    # null-skip: drop null elements, remap group offsets
                    lst = pa.ListArray.from_arrays(
                        pa.array(cv[np.r_[starts, n]], pa.int32()),
                        vals.filter(pa.array(valid)),
                    )
                    joined = pc.binary_join(lst, pa.scalar(self.concat_sep, vals.type))
                    nonempty = (cv[ends] - cv[starts]) > 0
                    pieces[out_name] = pc.if_else(
                        pa.array(nonempty), joined, pa.scalar(None, vals.type)
                    )
                elif a == "first":
                    # literal first/last row per group (reference takes
                    # list[0]/[-1], groupby.py:290-319 — not null-skipping)
                    pieces[out_name] = arr.take(starts_pa)
                elif a == "last":
                    pieces[out_name] = arr.take(pa.array(ends - 1))
                else:
                    conv.append((col, a, out_name))
        if conv:
            gt_cols = {"__gid__": pa.array(gid)}
            for col in {c for c, _, _ in conv}:
                gt_cols[col] = t.column(col)
            gt = pa.table(gt_cols)
            _ARROW_AGG = {
                "sum": ("sum", pc.ScalarAggregateOptions(min_count=0)),
                "count": ("count", None),
                "mean": ("mean", None),
                "min": ("min", None),
                "max": ("max", None),
                "nunique": ("count_distinct", None),
                "std": ("stddev", pc.VarianceOptions(ddof=1)),
                "var": ("variance", pc.VarianceOptions(ddof=1)),
            }
            spec, ren = [], {}
            for col, a, out_name in conv:
                fn, opt = _ARROW_AGG[a]
                spec.append((col, fn, opt) if opt is not None else (col, fn))
                ren[f"{col}_{fn}"] = out_name
            res = gt.group_by(["__gid__"], use_threads=False).aggregate(spec)
            res = res.sort_by("__gid__")  # first-occurrence gid order
            for name_in, out_name in ren.items():
                pieces[out_name] = res.column(name_in)
        out = pa.table(pieces)
        for i, c in enumerate(out.column_names):
            if any(c.endswith(f"{name_sep}{a}") for a in _INT32_RE):
                out = out.set_column(i, c, pc.cast(out.column(c), pa.int32()))
            elif any(c.endswith(f"{name_sep}{a}") for a in _F32_RE):
                out = out.set_column(i, c, pc.cast(out.column(c), pa.float32()))
        return out

    def _aggregate_table_pandas(self, agg_dict, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = self.groupby_cols
        sort_keys = self.sort_cols
        name_sep = self.name_sep
        ascending = self.ascending
        # render concat sources with the ARROW cast, not str(): str(True) is
        # 'True' / str(1.0) is '1.0' while pc.cast gives 'true' / '1' — the
        # two paths must emit identical strings regardless of which path an
        # unrelated median agg forces. A temp column keeps the source col
        # numeric for its other aggs.
        for col, col_aggs in agg_dict.items():
            if "concat" in col_aggs:
                c = t.column(col)
                if not (pa.types.is_string(c.type) or pa.types.is_large_string(c.type)):
                    c = pc.cast(c, pa.string())
                t = t.append_column(f"__{col}_cstr__", c)
        df = t.to_pandas()
        # keys ascending (stable group output order), sort_cols honor the
        # user's `ascending` — only IN-GROUP order is semantic
        df = df.sort_values(
            keys + sort_keys,
            ascending=[True] * len(keys) + [ascending] * len(sort_keys),
            kind="mergesort",
            ignore_index=True,
        )
        # pandas dropna=True groupby semantics: drop null-key rows
        df = df[~df[keys].isna().any(axis=1)].reset_index(drop=True)
        # change-point int gid over the SORTED keys — NUL-exact, unlike
        # pandas' StringHashTable groupby (see functions/aggregates.py)
        change = np.zeros(len(df), dtype=bool)
        if len(df):
            change[0] = True
        for k in keys:
            col = df[k]
            change[1:] |= ~col.iloc[1:].reset_index(drop=True).eq(
                col.iloc[:-1].reset_index(drop=True)
            ).to_numpy()
        gid = np.cumsum(change) - 1
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(df)] if len(starts) else starts
        g = df.groupby(gid, sort=False)
        # literal first/last row per group (reference takes list[0]/[-1],
        # groupby.py:290-319 — NOT pandas' null-skipping first/last)
        firsts = df.iloc[starts].reset_index(drop=True)
        lasts = df.iloc[ends - 1].reset_index(drop=True)
        pieces = {k: firsts[k] for k in keys}
        for col, col_aggs in agg_dict.items():
            for a in col_aggs:
                out_name = f"{col}{name_sep}{a}"
                if a == "list":
                    pieces[out_name] = g[col].agg(list).reset_index(drop=True)
                elif a == "concat":
                    sep = self.concat_sep
                    pieces[out_name] = (
                        g[f"__{col}_cstr__"]
                        .agg(
                            lambda s: (
                                sep.join(x for x in s if not pd.isna(x))
                                if s.notna().any()
                                else None
                            )
                        )
                        .reset_index(drop=True)
                    )
                elif a == "first":
                    pieces[out_name] = firsts[col]
                elif a == "last":
                    pieces[out_name] = lasts[col]
                else:
                    pieces[out_name] = g[col].agg(a).reset_index(drop=True)
        out = pd.DataFrame(pieces)
        for c in out.columns:
            if any(c.endswith(f"{name_sep}{a}") for a in _INT32_RE):
                out[c] = out[c].astype(np.int32)
            elif any(c.endswith(f"{name_sep}{a}") for a in _F32_RE):
                out[c] = out[c].astype(np.float32)
        return pa.Table.from_pandas(out, preserve_index=False)

    def apply_batch(self, col_selector, table: pa.Table) -> pa.Table:
        """In-process single-batch aggregate (the reference LocalExecutor
        path, /root/reference/nvtabular/workflow/workflow.py:250-254): the
        batch must contain each key's complete rows; output equals the
        Dataset path restricted to those keys."""
        return self._aggregate_table(self._agg_dict(col_selector), table)

    def _apply_bucketed(self, agg_dict, ds):
        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        # sorting happens inside _aggregate_table (ascending may be False),
        # so the runner itself does not sort
        return bucketed_group_map(
            ds,
            self.groupby_cols,
            [],
            lambda t: self._aggregate_table(agg_dict, t),
            num_buckets=self.num_buckets,
        )
