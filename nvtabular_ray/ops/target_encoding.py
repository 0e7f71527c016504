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
``fold_on`` MUST name a row-unique key (e.g. ["conv_id","turn_idx"]) and is
REQUIRED when kfold>1. The target column is never part of the fold hash:
folding on (category, target) would make leave-one-fold-out subtraction
remove exactly the rows sharing the row's own target value — the TE output
becomes a (smoothed) copy of the target, catastrophic train-time leakage.

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

from nvtabular_ray.functions.hashing import hash64_columns, hash64_columns_stable
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
        distributed: bool = False,
        split_out: Optional[int] = None,
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
        if kfold > 1 and not self.fold_on:
            raise ValueError(
                "TargetEncoding with kfold>1 requires fold_on=[...] naming a "
                "row-unique key (e.g. ['conv_id','turn_idx']): deriving folds "
                "from the (category, target) pair leaks the target"
            )
        if self.fold_on and target in self.fold_on:
            raise ValueError("fold_on must not contain the target column (target leakage)")
        self.drop_folds = drop_folds
        self.name_sep = name_sep
        # scale path: per-(category,fold) stat table too big to broadcast —
        # stays a Dataset, joined back by one bucketed shuffle (per-category
        # totals derived per bucket, so no second shuffle)
        self.distributed = distributed
        self.split_out = split_out
        self.distributed_stats: dict[str, dict] = {}
        self.state_tables: dict[str, pa.Table] = {}
        self.global_mean: Optional[float] = target_mean

    @property
    def dependencies(self):
        deps = [self.target]
        if self.fold_on:
            deps += [c for c in self.fold_on if c not in deps]
        for name in self.distributed_stats:
            deps += [
                f"__te_{name}_cnt_all__",
                f"__te_{name}_sum_all__",
                f"__te_{name}_cnt_f__",
                f"__te_{name}_sum_f__",
            ]
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

    def compute_output_schema(self, col_selector, input_schema):
        te_type = pa.from_numpy_dtype(np.dtype(self.out_dtype))
        out = {
            self._te_name(name, i): te_type
            for i, (name, _) in enumerate(self._groups(col_selector))
        }
        if self.kfold > 1 and not self.drop_folds:
            out[FOLD_NAME] = pa.int64()
        return out

    # ------------------------------------------------------------- fold --
    def _fold_np(self, table: pa.Table, input_cols: list[str]) -> np.ndarray:
        # fold_on is guaranteed set whenever kfold>1 (enforced in __init__);
        # it never includes the target, so fold ⊥ target given the row key.
        cols = self.fold_on or [c for c in input_cols if c in table.column_names and c != self.target]
        # folds feed persisted stats + label-free serving: version-stable hash
        h = hash64_columns_stable(table, cols)
        # mix in the seed so different seeds give different (still stable) folds
        h = h ^ np.uint64(self.fold_seed * 0x9E3779B97F4A7C15 % (1 << 64))
        return (h % np.uint64(self.kfold)).astype(np.int64)

    # -------------------------------------------------------------- fit --
    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        input_cols = list(col_selector.names) + [self.target] + (self.fold_on or [])
        if self.distributed:
            for name, group in self._groups(col_selector):
                self._fit_distributed(ds, name, group, input_cols)
            return
        for name, group in self._groups(col_selector):

            def partial(t: pa.Table, group=tuple(group)) -> pa.Table:
                # arrow group_by (NUL-exact string keys; aggregates.py note)
                sel = t.select(list(group) + [self.target])
                sel = sel.append_column(FOLD_NAME, pa.array(self._fold_np(t, input_cols)))
                res = sel.group_by(list(group) + [FOLD_NAME], use_threads=False).aggregate(
                    [(self.target, "count"), (self.target, "sum")]
                )
                ren = {f"{self.target}_count": "count", f"{self.target}_sum": "sum"}
                return res.rename_columns([ren.get(n, n) for n in res.column_names])

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

    def _fit_distributed(self, ds, name: str, group: list[str], input_cols) -> None:
        """Stat-table-bigger-than-memory path: per-(category,fold) count/sum
        stays a Dataset (one groupby shuffle), written as sharded parquet;
        the join back happens in ``pre_transform_stage``. Requires an
        explicit ``fold_on`` when kfold>1 so fold assignment can't depend on
        which columns happen to ride a batch. Multi-column groups hash the
        whole key tuple as the exchange key (reference ``cat_groups`` of
        lists, /root/reference/nvtabular/ops/target_encoding.py:35-61)."""
        if self.kfold > 1 and not self.fold_on:
            raise ValueError("distributed TargetEncoding with kfold>1 requires fold_on=[...]")
        keys = list(group)

        def partial(t: pa.Table) -> pa.Table:
            sel = t.select(keys + [self.target])
            sel = sel.append_column(FOLD_NAME, pa.array(self._fold_np(t, input_cols)))
            res = sel.group_by(keys + [FOLD_NAME], use_threads=False).aggregate(
                [(self.target, "count"), (self.target, "sum")]
            )
            ren = {f"{self.target}_count": "count", f"{self.target}_sum": "sum"}
            return res.rename_columns([ren.get(n, n) for n in res.column_names])

        parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # task-based hash exchange (not Ray's sort groupby); the exchange
        # materializes its buckets, so the two global sums and the parquet
        # write below all read the same (cardinality x folds)-row refs
        # instead of re-executing the scan.
        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        merged = bucketed_aggregate(parts, keys + [FOLD_NAME], {"count": "sum", "sum": "sum"})
        if self.global_mean is None:
            total_cnt = float(merged.sum("sum(count)") or 0.0)
            total_sum = float(merged.sum("sum(sum)") or 0.0)
            self.global_mean = total_sum / total_cnt if total_cnt else 0.0

        import os
        import tempfile

        import pyarrow.compute as _pc

        def tidy(t: pa.Table) -> pa.Table:
            out = {k: t.column(k) for k in keys}
            out[FOLD_NAME] = t.column(FOLD_NAME)
            out["count_y"] = _pc.cast(t.column("sum(count)"), pa.float64())
            out["sum_y"] = _pc.cast(t.column("sum(sum)"), pa.float64())
            return pa.table(out)

        stat_ds = merged.map_batches(tidy, batch_format="pyarrow")
        path = os.path.join(tempfile.mkdtemp(prefix="nvtr_te_"), f"te_stats.{name}")
        os.makedirs(path, exist_ok=True)
        stat_ds.write_parquet(path)
        self.distributed_stats[name] = {"path": path, "keys": keys}

    def pre_transform_stage(self, ds):
        for name, info in self.distributed_stats.items():
            ds = self._join_stats(ds, name, info)
        return ds

    def _join_stats(self, ds, name: str, info: dict):
        """ONE bucketed shuffle by hash(category): co-locates data rows with
        ALL fold rows of their category, so per-category totals are summed
        inside the bucket (no second shuffle); resolves the four __te_*
        dependency columns consumed by ``transform``."""
        import ray.data as rd

        from nvtabular_ray.arrow_utils import dataset_arrow_schema, as_single_chunk
        from nvtabular_ray.functions.hashing import hash64_columns
        from nvtabular_ray.pipelines.partitioned import (
            _default_num_buckets,
            bucketed_group_map,
        )

        keys = list(info.get("keys") or [info["key"]])
        deps = [
            f"__te_{name}_cnt_all__",
            f"__te_{name}_sum_all__",
            f"__te_{name}_cnt_f__",
            f"__te_{name}_sum_f__",
        ]
        stat = rd.read_parquet(info["path"])
        num_buckets = self.split_out or _default_num_buckets()
        schema = dataset_arrow_schema(ds)
        data_names = list(schema.names)
        data_types = dict(zip(schema.names, schema.types))
        input_cols = data_names

        def bucket_of(tbl: pa.Table) -> np.ndarray:
            # whole key tuple hashed as the exchange key
            return (hash64_columns(tbl, keys) % np.uint64(num_buckets)).astype(np.int32)

        def pad_data(t: pa.Table) -> pa.Table:
            t = t.append_column("__vbkt__", pa.array(bucket_of(t)))
            t = t.append_column(
                "__te_fold__",
                pa.array(
                    self._fold_np(t, input_cols)
                    if self.kfold > 1
                    else np.zeros(t.num_rows, np.int64)
                ),
            )
            for d in deps + ["__te_cnt__", "__te_sum__"]:
                t = t.append_column(d, pa.nulls(t.num_rows, pa.float64()))
            t = t.append_column("__vside__", pa.array(np.zeros(t.num_rows, np.int8)))
            return t

        def pad_stat(t: pa.Table) -> pa.Table:
            kvals = {
                k: as_single_chunk(t.column(k).cast(data_types[k])) for k in keys
            }
            out = {
                c: (kvals[c] if c in kvals else pa.nulls(t.num_rows, data_types[c]))
                for c in data_names
            }
            out["__vbkt__"] = pa.array(bucket_of(pa.table(kvals)))
            out["__te_fold__"] = t.column(FOLD_NAME).cast(pa.int64())
            for d in deps:
                out[d] = pa.nulls(t.num_rows, pa.float64())
            out["__te_cnt__"] = t.column("count_y")
            out["__te_sum__"] = t.column("sum_y")
            out["__vside__"] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(out)

        order = data_names + ["__vbkt__", "__te_fold__"] + deps + [
            "__te_cnt__", "__te_sum__", "__vside__"
        ]
        both = (
            ds.map_batches(pad_data, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(order)
            .union(stat.map_batches(pad_stat, batch_format="pyarrow").select_columns(order))
        )

        def per_bucket(t: pa.Table) -> pa.Table:
            side = t.column("__vside__").to_numpy(zero_copy_only=False)
            sdf = (
                t.filter(pa.array(side == 1))
                .select(keys + ["__te_fold__", "__te_cnt__", "__te_sum__"])
                .to_pandas()
            )
            all_df = (
                sdf.groupby(keys, dropna=False, observed=True)[["__te_cnt__", "__te_sum__"]]
                .sum()
                .reset_index()
                .rename(columns={"__te_cnt__": "__a_cnt__", "__te_sum__": "__a_sum__"})
            )
            dtab = t.filter(pa.array(side == 0))
            left = dtab.select(keys + ["__te_fold__"]).to_pandas()
            m_all = left.merge(all_df, on=keys, how="left")
            m_f = left.merge(sdf, on=keys + ["__te_fold__"], how="left")
            drop = ["__vbkt__", "__te_fold__", "__te_cnt__", "__te_sum__", "__vside__"] + deps
            out = dtab.drop_columns(drop)
            cols = {
                deps[0]: m_all["__a_cnt__"],
                deps[1]: m_all["__a_sum__"],
                deps[2]: m_f["__te_cnt__"],
                deps[3]: m_f["__te_sum__"],
            }
            for d, series in cols.items():
                out = out.append_column(d, pa.Array.from_pandas(series, type=pa.float64()))
            return out

        return bucketed_group_map(both, ["__vbkt__"], [], per_bucket, num_buckets=num_buckets)

    def clear(self):
        super().clear()
        self.state_tables = {}
        self.distributed_stats = {}
        self.global_mean = self.target_mean
        self._refs = {}

    # -------------------------------------------------------- transform --
    @property
    def optional_dependencies(self):
        # reference serving semantics (target_encoding.py:359-368): when the
        # target column is ABSENT from the transform input (inference
        # traffic has no label), encode with the global per-category stats —
        # no fold subtraction. Only optional once fitted; fit needs it.
        return [self.target] if getattr(self, "fitted", False) else []

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        input_cols = list(col_selector.names) + self.dependencies
        has_target = self.target in table.column_names
        fold = self._fold_np(table, input_cols) if (self.kfold > 1 and has_target) else None
        out = {}
        for i, (name, group) in enumerate(self._groups(col_selector)):
            if name in self.distributed_stats:
                # stats resolved by the pre_transform_stage shuffle join
                cnt_all = table.column(f"__te_{name}_cnt_all__").to_pandas()
                sum_all_s = table.column(f"__te_{name}_sum_all__").to_pandas()
                cnt_f = table.column(f"__te_{name}_cnt_f__").to_pandas()
                sum_f_s = table.column(f"__te_{name}_sum_f__").to_pandas()
                unseen = cnt_all.isna().to_numpy()
                ca = cnt_all.to_numpy(dtype="float64", na_value=0.0)
                sa = sum_all_s.to_numpy(dtype="float64", na_value=0.0)
                cf = cnt_f.to_numpy(dtype="float64", na_value=0.0)
                sf = sum_f_s.to_numpy(dtype="float64", na_value=0.0)
                if self.kfold <= 1 or not has_target:
                    cf = np.zeros(len(ca))
                    sf = np.zeros(len(ca))
                gmean = self.global_mean
                denom = (ca - cf) + self.p_smooth
                te = ((sa - sf) + self.p_smooth * gmean) / denom
                te = np.where(denom > 0, te, gmean)
                te[unseen] = gmean
                out[self._te_name(name, i)] = pa.array(te.astype(self.out_dtype))
                continue
            left = table.select(group).to_pandas()
            all_stats = self.state_pandas(f"{name}__all")
            merged = left.merge(all_stats, on=group, how="left")
            cnt_all = merged["count_y_all"].to_numpy(dtype="float64", na_value=0.0)
            sum_all = merged["sum_y_all"].to_numpy(dtype="float64", na_value=0.0)
            if self.kfold > 1 and has_target:
                left[FOLD_NAME] = fold
                fold_stats = self.state_pandas(f"{name}__folds")
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
            if fold is None:
                # fold derives from fold_on alone — serving traffic without
                # the target must still get its fold column
                fold = self._fold_np(table, input_cols)
            out[FOLD_NAME] = pa.array(fold)
        return pa.table(out)
