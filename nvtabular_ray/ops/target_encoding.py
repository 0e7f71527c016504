"""TargetEncoding: out-of-fold smoothed target mean per categorical group.

Reference: /root/reference/nvtabular/ops/target_encoding.py:35-439.

    TE = (sum_other_folds + p_smooth * global_mean)
         / (count_other_folds + p_smooth)

computed leave-one-fold-out (fold subtraction at target_encoding.py:340-356),
NaN (unseen category) filled with the global mean, output float32 named
``TE_{group}_{target}``.

Fold assignment (deliberate divergence, SURVEY.md §7.4.2): the reference's
``_add_fold`` seeds a RandomState over the *partition-local* row index
(target_encoding.py:427-439) — fold membership changes with the partition
layout. We define ``fold = stable_hash(fold_on columns) % kfold``:
deterministic, partition-layout-free, identical in fit and transform.
``fold_on`` should name a row-unique key (e.g. ["conv_id","turn_idx"]);
when omitted, all input+target columns are hashed.

Ray design: fit = one map_batches pass of per-batch grouped (count,sum)
partials per (group, fold) -> one small groupby shuffle -> driver holds both
the per-(group,fold) and per-group stat tables (global mean derived from the
same totals — no extra pass). Transform = broadcast merge per batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from nvtabular_ray.functions.hashing import hash64_columns
from nvtabular_ray.ops.base import BroadcastTableState, StatOperator

FOLD_NAME = "__fold__"


class TargetEncoding(BroadcastTableState, StatOperator):
    output_tags = ["continuous"]

    def __init__(
        self,
        target: str,
        target_mean: Optional[float] = None,
        kfold: int = 3,
        fold_seed: int = 42,
        p_smooth: int = 20,
        out_col=None,
        out_dtype: str = "float32",
        fold_on: Optional[list[str]] = None,
        drop_folds: bool = True,
        name_sep: str = "_",
    ):
        StatOperator.__init__(self)
        if isinstance(target, (list, tuple)):
            if len(target) != 1:
                raise NotImplementedError("one target column supported")
            target = target[0]
        self.target = target
        self.target_mean = target_mean  # user-supplied global mean (reference :132)
        self.kfold = kfold
        self.fold_seed = fold_seed
        self.p_smooth = p_smooth
        self.out_col = out_col
        self.out_dtype = out_dtype
        self.fold_on = list(fold_on) if fold_on else None
        self.drop_folds = drop_folds
        self.name_sep = name_sep
        self.state_tables: dict[str, pa.Table] = {}
        self.global_mean: Optional[float] = target_mean

    @property
    def dependencies(self):
        deps = [self.target]
        if self.fold_on:
            deps += [c for c in self.fold_on if c not in deps]
        return deps

    def _groups(self, col_selector) -> list[tuple[str, list[str]]]:
        out = []
        for g in col_selector.grouped_names:
            if isinstance(g, str):
                out.append((g, [g]))
            else:
                out.append((self.name_sep.join(g), list(g)))
        return out

    def _te_name(self, name: str, idx: int) -> str:
        if self.out_col:
            cols = self.out_col if isinstance(self.out_col, (list, tuple)) else [self.out_col]
            return cols[idx]
        return f"TE_{name}_{self.target}"

    def column_mapping(self, col_selector):
        mapping = {}
        for i, (name, group) in enumerate(self._groups(col_selector)):
            mapping[self._te_name(name, i)] = [self.target, *group]
        if self.kfold > 1 and not self.drop_folds:
            mapping[FOLD_NAME] = []
        return mapping

    # ------------------------------------------------------------- fold --
    def _fold_np(self, table: pa.Table, input_cols: list[str]) -> np.ndarray:
        cols = self.fold_on or [c for c in input_cols if c in table.column_names]
        h = hash64_columns(table, cols)
        # mix in the seed so different seeds give different (still stable) folds
        h = h ^ np.uint64(self.fold_seed * 0x9E3779B97F4A7C15 % (1 << 64))
        return (h % np.uint64(self.kfold)).astype(np.int64)

    # -------------------------------------------------------------- fit --
    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        input_cols = list(col_selector.names) + self.dependencies
        for name, group in self._groups(col_selector):

            def partial(t: pa.Table, group=tuple(group)) -> pa.Table:
                df = t.select(list(group) + [self.target]).to_pandas()
                df[FOLD_NAME] = self._fold_np(t, input_cols)
                g = df.groupby(list(group) + [FOLD_NAME], dropna=False, observed=True)
                out = g[self.target].agg(["count", "sum"]).reset_index()
                return pa.Table.from_pandas(out, preserve_index=False)

            parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            fold_stats = grouped_reduce(
                parts, list(group) + [FOLD_NAME], {"count": "sum", "sum": "sum"}
            ).rename(columns={"count": "count_y", "sum": "sum_y"})
            all_stats = (
                fold_stats.groupby(list(group), dropna=False, observed=True)[["count_y", "sum_y"]]
                .sum()
                .reset_index()
                .rename(columns={"count_y": "count_y_all", "sum_y": "sum_y_all"})
            )
            if self.global_mean is None:
                total_cnt = float(all_stats["count_y_all"].sum())
                total_sum = float(all_stats["sum_y_all"].sum())
                self.global_mean = total_sum / total_cnt if total_cnt else 0.0
            self.state_tables[f"{name}__folds"] = pa.Table.from_pandas(
                fold_stats, preserve_index=False
            )
            self.state_tables[f"{name}__all"] = pa.Table.from_pandas(
                all_stats, preserve_index=False
            )

    def clear(self):
        super().clear()
        self.state_tables = {}
        self.global_mean = self.target_mean
        self._refs = {}

    # -------------------------------------------------------- transform --
    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        input_cols = list(col_selector.names) + self.dependencies
        fold = self._fold_np(table, input_cols) if self.kfold > 1 else None
        out = {}
        for i, (name, group) in enumerate(self._groups(col_selector)):
            left = table.select(group).to_pandas()
            all_stats = self.state_tables[f"{name}__all"].to_pandas()
            merged = left.merge(all_stats, on=group, how="left")
            cnt_all = merged["count_y_all"].to_numpy(dtype="float64", na_value=0.0)
            sum_all = merged["sum_y_all"].to_numpy(dtype="float64", na_value=0.0)
            if self.kfold > 1:
                left[FOLD_NAME] = fold
                fold_stats = self.state_tables[f"{name}__folds"].to_pandas()
                mf = left.merge(fold_stats, on=list(group) + [FOLD_NAME], how="left")
                cnt_f = mf["count_y"].to_numpy(dtype="float64", na_value=0.0)
                sum_f = mf["sum_y"].to_numpy(dtype="float64", na_value=0.0)
            else:
                cnt_f = np.zeros(len(left))
                sum_f = np.zeros(len(left))
            gmean = self.global_mean
            denom = (cnt_all - cnt_f) + self.p_smooth
            te = ((sum_all - sum_f) + self.p_smooth * gmean) / denom
            # unseen categories: count_all==count_fold==0 -> smoothed to gmean
            te = np.where(denom > 0, te, gmean)
            unseen = merged["count_y_all"].isna().to_numpy()
            te[unseen] = gmean
            out[self._te_name(name, i)] = pa.array(te.astype(self.out_dtype))
        if self.kfold > 1 and not self.drop_folds:
            out[FOLD_NAME] = pa.array(fold)
        return pa.table(out)
