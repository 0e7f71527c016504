"""Categorify: category -> contiguous integer encoding.

Encoding convention (reference /root/reference/nvtabular/ops/categorify.py:52-71):

- ``0``   : reserved for padding (never produced).
- ``1``   : null/NaN values.
- ``[2, 2 + num_oov)`` : out-of-vocabulary values; ``num_oov = num_buckets or 1``
  (a single OOV index 2 when ``num_buckets is None``, categorify.py:182-197).
- ``[2 + num_oov, ...)`` : the vocabulary, sorted most-frequent-first with a
  deterministic (count desc, value asc) tie-break — the reference's sort has
  no tie-break and is partition-layout-dependent (categorify.py:1300-1316);
  ours is partition-count-invariant (SURVEY.md §7.4.1).

Fit (Ray-Data-first, replacing the reference's hand-built Dask tree reduction,
categorify.py:955-1137): one ``map_batches`` pass emits per-batch value
counts (the map-side combine), a ``groupby("value").sum`` merges them — Ray
owns the shuffle — and the (small) vocabulary is collected, sorted and
frozen on the driver. A ``cardinality_memory_limit`` guards the collect,
mirroring categorify.py:199-203.

Transform: vectorized ``pa.compute.index_in`` against the broadcast vocab
(actor pools load it once per worker — the Ray analog of the reference's
per-worker ``cat_cache``, categorify.py:1627-1643). OOV values hash with the
engine-wide stable hash into the OOV range.

Supports: ``freq_threshold``, ``max_size``, ``num_buckets``, user ``vocabs``,
multi-column joint groups (shared vocab) and ``encode_type="combo"``
(encode the tuple; output column "a_b", categorify.py:250-272), list
(multi-hot) columns (categorify.py:1695-1705).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from nvtabular_ray.arrow_utils import dataset_arrow_schema, as_single_chunk, is_list_type, map_list_values
from nvtabular_ray.functions.hashing import (
    hash64,
    hash64_columns,
    hash64_columns_stable,
    hash64_stable,
)
from nvtabular_ray.ops.base import StatOperator

PAD_OFFSET = 0
NULL_OFFSET = 1
OOV_OFFSET = 2

_BROADCAST_BYTES = 1 << 20  # vocab larger than 1 MiB -> ray.put broadcast + actor pool


def _make_name(*args, sep="_"):
    return sep.join(args)


def _combo_composite(t: pa.Table, cols: list[str]) -> pa.Array:
    """Injective string encoding of a column TUPLE, for joining combo
    groups through a single-value exchange: each member is rendered as
    ``{codepoint_len}:{value}`` and the parts joined with ':'; the length
    prefixes make parsing unambiguous even when values contain ':'.
    Null propagation: ANY null member -> null composite (combo rows with a
    null member encode as the null code, matching the broadcast path)."""
    args = []
    for c in cols:
        s = pc.cast(as_single_chunk(t.column(c)), pa.string())
        args.append(pc.cast(pc.utf8_length(s), pa.string()))
        args.append(s)
    return pc.binary_join_element_wise(*args, ":")


# per-worker-process vocab cache for cat_cache="disk" (one read per process,
# shared by every actor/task in it — the Ray analog of the reference's
# worker-level cat_cache LRU, categorify.py:1627-1643)
_DISK_VOCAB_CACHE: dict = {}


def _disk_cache_read(path: str) -> pa.Table:
    # cache key includes (mtime_ns, size): a refit rewrites the vocab to the
    # SAME path, and long-lived worker processes would otherwise keep
    # serving the stale pre-refit table with no error
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    tab = _DISK_VOCAB_CACHE.get(key)
    if tab is None:
        for k in [k for k in _DISK_VOCAB_CACHE if k[0] == path]:
            del _DISK_VOCAB_CACHE[k]  # drop superseded versions of THIS path
        tab = pq.read_table(path)
        _DISK_VOCAB_CACHE[key] = tab
    return tab


class Categorify(StatOperator):
    output_tags = ["categorical"]

    def __init__(
        self,
        freq_threshold: int = 0,
        out_path: Optional[str] = None,
        num_buckets: Optional[int] = None,
        max_size: int = 0,
        encode_type: str = "joint",
        name_sep: str = "_",
        vocabs: Optional[dict] = None,
        cardinality_memory_limit: int = 2 << 30,
        distributed: bool = False,
        split_out: Optional[int] = None,
        dtype=None,
        search_sorted: bool = False,
        single_table: bool = False,
        cat_cache: str = "broadcast",
    ):
        super().__init__()
        if encode_type not in ("joint", "combo"):
            raise ValueError("encode_type must be 'joint' or 'combo'")
        if num_buckets is not None and num_buckets < 2:
            raise ValueError("num_buckets should be an int > 1, or None")
        if search_sorted and (freq_threshold or num_buckets):
            # reference categorify.py:307-309: searchsorted encode requires
            # the full vocabulary (no threshold drop / OOV hash buckets)
            raise ValueError(
                "search_sorted=True cannot be combined with freq_threshold or num_buckets"
            )
        if cat_cache not in ("broadcast", "disk"):
            raise ValueError("cat_cache must be 'broadcast' or 'disk'")
        # encode via binary search over a sorted vocab instead of a hash
        # lookup (reference categorify.py:180) — faster for sorted int vocabs
        self.search_sorted = search_sorted
        # all encoded columns share ONE contiguous index space: column i's
        # codes start where column i-1's range ends (reference
        # categorify.py:219,410-415 single_table)
        self.single_table = single_table
        # vocab distribution tier (reference cat_cache, categorify.py:169-173):
        # "broadcast" = ray.put once, zero-copy object-store reads;
        # "disk" = vocab parquet on local disk, loaded + cached per worker
        # PROCESS — the middle tier for 1-50GB vocabs that would crowd the
        # object store on a 100-TB run
        self.cat_cache = cat_cache
        self._single_offsets: dict[str, int] = {}
        self._ss_cache: dict[str, tuple] = {}
        self._disk_paths: dict[str, str] = {}
        self.freq_threshold = freq_threshold
        self.out_path = out_path
        self.num_buckets = num_buckets
        self.max_size = max_size
        self.encode_type = encode_type
        self.name_sep = name_sep
        self.cardinality_memory_limit = cardinality_memory_limit
        # output code dtype override (reference categorify.py:211); None -> int64
        self.dtype = dtype
        # scale path (reference split_out>1 analog, categorify.py:1644-1679):
        # vocab never materializes on the driver; encode is a shuffle join
        self.distributed = distributed
        self.split_out = split_out
        self.distributed_vocabs: dict[str, dict] = {}
        self.dependencies: list[str] = []  # __catcode_{col}__ in distributed mode
        # group storage name -> vocab pa.Table (value col(s) + "{name}_size")
        self.vocab_tables: dict[str, pa.Table] = {}
        self.null_counts: dict[str, int] = {}
        self._refs: dict[str, object] = {}
        if vocabs:
            for col, values in vocabs.items():
                arr = pa.array(values)
                self.vocab_tables[col] = pa.table(
                    {col: arr, f"{col}_size": pa.array(np.zeros(len(arr), np.int64))}
                )
            self.fitted = True

    # ----------------------------------------------------------- groups --
    def _groups(self, col_selector) -> list[tuple[str, list[str]]]:
        """(storage/output name, member columns) per encoding group."""
        out = []
        for g in col_selector.grouped_names:
            if isinstance(g, str):
                out.append((g, [g]))
            else:
                out.append((_make_name(*g, sep=self.name_sep), list(g)))
        return out

    @property
    def num_oov(self) -> int:
        return self.num_buckets if self.num_buckets else 1

    def compute_output_schema(self, col_selector, input_schema):
        import numpy as _np

        code = pa.from_numpy_dtype(_np.dtype(self.dtype)) if self.dtype else pa.int64()
        out = {}
        for out_col, sources in self.column_mapping(col_selector).items():
            t = input_schema.get(sources[0]) if sources else None
            if t is not None and pa.types.is_list(t):
                out[out_col] = pa.list_(code)
            elif t is not None and pa.types.is_large_list(t):
                out[out_col] = pa.large_list(code)
            else:
                out[out_col] = code
        return out

    @property
    def vocab_base(self) -> int:
        return OOV_OFFSET + self.num_oov

    # -------------------------------------------------------------- fit --
    def fit(self, col_selector, ds) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        schema = dataset_arrow_schema(ds)
        types = dict(zip(schema.names, schema.types))

        def value_type(c):
            t = types[c]
            return t.value_type if (pa.types.is_list(t) or pa.types.is_large_list(t)) else t

        todo = [
            (name, cols)
            for name, cols in self._groups(col_selector)
            if not (name in self.vocab_tables and self.fitted)
        ]
        combos = [(n, c) for n, c in todo if len(c) > 1 and self.encode_type == "combo"]
        singles = [(n, c) for n, c in todo if not (len(c) > 1 and self.encode_type == "combo")]

        if self.distributed:
            for name, cols in combos:
                self._fit_combo_distributed(ds, name, cols, types)
            for name, cols in singles:
                self._fit_distributed(ds, name, cols, value_type)
            if self.single_table:
                self._compute_single_offsets(col_selector)
            self._write_artifacts()
            return

        for name, cols in combos:
            self._fit_combo(ds, name, cols)

        # FUSED single/joint fit: ONE pass + ONE groupby for ALL columns.
        # Values ride the shuffle as strings keyed by group name; string/int/
        # bool round-trip exactly (float categoricals fall back to per-group).
        fuseable, fallback = [], []
        for name, cols in singles:
            if all(
                pa.types.is_string(value_type(c))
                or pa.types.is_large_string(value_type(c))
                or pa.types.is_integer(value_type(c))
                or pa.types.is_boolean(value_type(c))
                for c in cols
            ):
                fuseable.append((name, cols))
            else:
                fallback.append((name, cols))

        if fuseable:
            plan = self._fuseable_plan(fuseable, value_type)
            merged = grouped_reduce(
                ds.map_batches(plan.partial, batch_format="pyarrow", zero_copy_batch=True),
                plan.keys,
                plan.agg_spec,
            )
            plan.finalize(merged)

        for name, cols in fallback:

            def partial1(t: pa.Table, cols=tuple(cols)) -> pa.Table:
                vals, cnts, nulls = [], [], 0
                for c in cols:
                    arr = as_single_chunk(t.column(c))
                    if is_list_type(arr.type):
                        arr = arr.flatten()
                    nulls += arr.null_count
                    vc = pc.value_counts(arr.drop_null())
                    vals.append(vc.field("values"))
                    cnts.append(pc.cast(vc.field("counts"), pa.int64()))
                value = pa.concat_arrays([v.cast(vals[0].type) for v in vals])
                out = pa.table({"value": value, "count": pa.concat_arrays(cnts)})
                if out.num_rows == 0 and nulls:
                    # all-null batch: sentinel row carries the null count
                    out = pa.table(
                        {
                            "value": pa.nulls(1, vals[0].type),
                            "count": pa.array([0], pa.int64()),
                        }
                    )
                nulls_col = ([nulls] + [0] * (out.num_rows - 1)) if out.num_rows else []
                return out.append_column("nulls", pa.array(nulls_col, pa.int64()))

            merged1 = grouped_reduce(
                ds.map_batches(partial1, batch_format="pyarrow", zero_copy_batch=True),
                ["value"],
                {"count": "sum", "nulls": "sum"},
            )
            self._check_vocab_size(name, merged1)
            nulls = int(merged1["nulls"].sum())
            merged1 = merged1[merged1["count"] > 0].reset_index(drop=True)  # drop sentinels
            vocab_df = merged1.drop(columns=["nulls"])
            self._finalize_vocab(name, cols[0] if len(cols) == 1 else name, vocab_df, nulls)

        if self.single_table:
            self._compute_single_offsets(col_selector)
        self._write_artifacts()

    def _fuseable_plan(self, fuseable, value_type):
        """FUSED single/joint fit as a FitPlan: ONE pass + ONE groupby for
        ALL fuseable columns. Values ride the merge as strings keyed by
        group name; string/int/bool round-trip exactly (float categoricals
        fall back to per-group)."""
        from nvtabular_ray.ops.base import FitPlan

        group_of = [(name, c) for name, cols in fuseable for c in cols]

        def partial(t: pa.Table, group_of=tuple(group_of)) -> pa.Table:
            names_out, vals_out, cnts_out, nulls_out = [], [], [], []
            for gname, c in group_of:
                arr = as_single_chunk(t.column(c))
                if is_list_type(arr.type):
                    arr = arr.flatten()
                nulls = arr.null_count
                vc = pc.value_counts(arr.drop_null())
                v = pc.cast(vc.field("values"), pa.string())
                k = len(v)
                if k == 0 and nulls:
                    # all-null batch: carry the null count on a sentinel
                    # row (null value, count 0) so it isn't dropped
                    names_out.append(pa.array([gname], pa.string()))
                    vals_out.append(pa.array([None], pa.string()))
                    cnts_out.append(pa.array([0], pa.int64()))
                    nulls_out.append(pa.array([nulls], pa.int64()))
                    continue
                names_out.append(pa.array([gname] * k, pa.string()))
                vals_out.append(v)
                cnts_out.append(pc.cast(vc.field("counts"), pa.int64()))
                nulls_out.append(
                    pa.array(([nulls] + [0] * (k - 1)) if k else [], pa.int64())
                )
            return pa.table(
                {
                    "g": pa.concat_arrays(names_out),
                    "value": pa.concat_arrays(vals_out),
                    "count": pa.concat_arrays(cnts_out),
                    "nulls": pa.concat_arrays(nulls_out),
                }
            )

        def finalize(merged, fuseable=tuple(fuseable)):
            for name, cols in fuseable:
                vocab_df = merged[merged["g"] == name].drop(columns=["g"]).reset_index(drop=True)
                self._check_vocab_size(name, vocab_df)
                nulls = int(vocab_df["nulls"].sum())
                # drop the all-null-batch sentinel rows (count 0); genuine
                # vocab entries always have count >= 1
                vocab_df = vocab_df[vocab_df["count"] > 0].reset_index(drop=True)
                vocab_df = vocab_df.drop(columns=["nulls"])
                # cast string-transported values back to the column dtype
                vt = value_type(cols[0])
                if not (pa.types.is_string(vt) or pa.types.is_large_string(vt)):
                    vocab_df["value"] = (
                        pc.cast(pa.Array.from_pandas(vocab_df["value"]), vt).to_pandas()
                    )
                self._finalize_vocab(name, cols[0] if len(cols) == 1 else name, vocab_df, nulls)

        return FitPlan(partial, ["g", "value"], {"count": "sum", "nulls": "sum"}, finalize)

    def fit_partials(self, col_selector, ds):
        """Fusion protocol: a single plan covering every fuseable single/
        joint group. Opts out (None) whenever any combo, float-typed
        fallback, or distributed path is involved — those keep their own
        fit machinery."""
        if self.distributed:
            return None
        schema = dataset_arrow_schema(ds)
        types = dict(zip(schema.names, schema.types))

        def value_type(c):
            t = types[c]
            return t.value_type if (pa.types.is_list(t) or pa.types.is_large_list(t)) else t

        todo = [
            (name, cols)
            for name, cols in self._groups(col_selector)
            if not (name in self.vocab_tables and self.fitted)
        ]
        if not todo:
            return None
        if any(len(c) > 1 and self.encode_type == "combo" for _, c in todo):
            return None
        for _, cols in todo:
            if not all(
                pa.types.is_string(value_type(c))
                or pa.types.is_large_string(value_type(c))
                or pa.types.is_integer(value_type(c))
                or pa.types.is_boolean(value_type(c))
                for c in cols
            ):
                return None
        inner = self._fuseable_plan(todo, value_type)

        def finalize(df):
            inner.finalize(df)
            # fit()'s tail: offsets + artifacts must run on the fused path too
            if self.single_table:
                self._compute_single_offsets(col_selector)
            self._write_artifacts()

        from nvtabular_ray.ops.base import FitPlan

        return [FitPlan(inner.partial, inner.keys, inner.agg_spec, finalize)]

    def _compute_single_offsets(self, col_selector) -> None:
        """single_table: stack every group's encoding window into one shared
        index space — group i's window [null, oov, vocab] starts where group
        i-1's ends (reference categorify.py:410-415, fit_finalize idx_count).
        Pad index 0 stays global. Works with distributed=True too: the
        offsets only need each group's CARDINALITY, which the distributed
        fit records as driver-small metadata (num_rows) — the vocab rows
        themselves never leave the cluster."""
        running = 0
        for name, _cols in self._groups(col_selector):
            self._single_offsets[name] = running
            if name in self.distributed_vocabs:
                card = self.distributed_vocabs[name]["num_rows"]
            else:
                card = self.vocab_tables[name].num_rows
            running += (self.vocab_base - 1) + card

    def _fit_combo(self, ds, name: str, cols: list[str]) -> None:
        from nvtabular_ray.functions.aggregates import grouped_reduce

        def partial(t: pa.Table, cols=tuple(cols)) -> pa.Table:
            # null-safe arrow group_by, not pandas (NUL-exact string keys; see
            # functions/aggregates.py note). Null-member tuples were already
            # correct here (duplicate null rows sum away in combine/finalize)
            # but the helper keeps partials exact under pyarrow 16.1's
            # multi-key null-group bug (arrow_utils.null_safe_group_by)
            from nvtabular_ray.arrow_utils import null_safe_group_by

            res = null_safe_group_by(
                t.select(list(cols)), list(cols), [([], "count_all")]
            )
            return res.rename_columns(
                ["count" if n == "count_all" else n for n in res.column_names]
            )

        parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        vocab_df = grouped_reduce(parts, list(cols), {"count": "sum"})
        self._check_vocab_size(name, vocab_df)
        # rows with any null member are encoded as null (code 1), not vocab
        null_mask = vocab_df[list(cols)].isna().any(axis=1)
        nulls = int(vocab_df.loc[null_mask, "count"].sum())
        vocab_df = vocab_df.loc[~null_mask]
        vocab_df = vocab_df.rename(columns={"count": "count"})
        self._finalize_vocab(name, list(cols), vocab_df, nulls, value_cols=list(cols))

    def _fit_combo_distributed(self, ds, name: str, cols: list[str], types) -> None:
        """Distributed fit for ``encode_type="combo"`` multi-column groups:
        the vocabulary is the set of DISTINCT COLUMN TUPLES, kept a Ray
        Dataset end-to-end (same scale plan as ``_fit_distributed``):
        per-batch tuple counts -> one hash exchange keyed on the whole
        tuple -> distributed (count desc, cols asc) sort -> rank-from-
        metadata code assignment -> sharded vocab parquet holding the
        ORIGINAL member columns (so code order matches the broadcast
        ``_fit_combo``/``_finalize_vocab`` tie-break exactly). Rows with
        ANY null member are null-encoded, never vocab rows (broadcast
        parity, reference categorify.py joint/combo semantics :52-55)."""
        import ray

        for c in cols:
            if is_list_type(types[c]):
                raise NotImplementedError(
                    "distributed combo Categorify does not support list member columns"
                )

        def partial(t: pa.Table, cols=tuple(cols)) -> pa.Table:
            # null-safe multi-key grouping (arrow_utils.null_safe_group_by);
            # duplicate null-tuple rows would sum away below, but exact
            # partials keep the exchange minimal
            from nvtabular_ray.arrow_utils import null_safe_group_by

            res = null_safe_group_by(
                t.select(list(cols)), list(cols), [([], "count_all")]
            )
            res = res.rename_columns(
                ["count" if n == "count_all" else n for n in res.column_names]
            )
            anynull = pc.is_null(res.column(cols[0]))
            for c in cols[1:]:
                anynull = pc.or_(anynull, pc.is_null(res.column(c)))
            nulls = int(
                pc.sum(pc.if_else(anynull, res.column("count"), pa.scalar(0, pa.int64()))).as_py()
                or 0
            )
            res = res.filter(pc.invert(anynull))
            if res.num_rows == 0 and nulls:
                # all-null batch: sentinel row (all-null tuple, count 0)
                # carries the null count through the exchange
                res = pa.table(
                    {
                        **{c: pa.nulls(1, res.schema.field(c).type) for c in cols},
                        "count": pa.array([0], pa.int64()),
                    }
                )
            nulls_col = ([nulls] + [0] * (res.num_rows - 1)) if res.num_rows else []
            return res.append_column("nulls", pa.array(nulls_col, pa.int64()))

        parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        counts = bucketed_aggregate(parts, list(cols), {"count": "sum", "nulls": "sum"})
        nulls_total = int(counts.sum("sum(nulls)") or 0)
        thresh = self.freq_threshold if self.freq_threshold and self.freq_threshold > 1 else None

        def tidy(t: pa.Table) -> pa.Table:
            t = pa.table({**{c: t.column(c) for c in cols}, "count": t.column("sum(count)")})
            # count >= 1 drops the all-null sentinel rows from the vocab
            return t.filter(pc.greater_equal(t.column("count"), thresh or 1))

        ranked = counts.map_batches(tidy, batch_format="pyarrow").sort(
            ["count"] + list(cols), descending=[True] + [False] * len(cols)
        )
        if self.max_size:
            keep = self.max_size - OOV_OFFSET - self.num_oov
            if keep < 1:
                raise ValueError("max_size cannot be less than num_buckets + 3")
            ranked = ranked.limit(keep)

        root = self.out_path or tempfile.mkdtemp(prefix="nvtr_vocab_")
        path = os.path.join(root, f"vocab.{name}")
        os.makedirs(path, exist_ok=True)
        base = self.vocab_base
        size_col = f"{name}_size"

        @ray.remote
        def write_shard(block: pa.Table, offset: int, shard_path: str) -> int:
            codes = pa.array(np.arange(block.num_rows, dtype=np.int64) + offset + base)
            pq.write_table(
                pa.table(
                    {
                        **{c: block.column(c) for c in cols},
                        size_col: block.column("count"),
                        "__code__": codes,
                    }
                ),
                shard_path,
            )
            return block.num_rows

        mat = ranked.materialize()
        futures, offset = [], 0
        i = 0
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                n = meta.num_rows
                if n is None:
                    n = ray.get(ref).num_rows
                if n == 0:
                    continue
                futures.append(
                    write_shard.remote(ref, offset, os.path.join(path, f"part-{i:05d}.parquet"))
                )
                offset += n
                i += 1
        ray.get(futures)
        self.distributed_vocabs[name] = {
            "path": path,
            "cols": list(cols),
            "num_rows": offset,
            "combo": True,
        }
        self.null_counts[name] = nulls_total
        dep = f"__catcode_{name}__"
        if dep not in self.dependencies:
            self.dependencies.append(dep)

    # ---------------------------------------------- distributed (scale) --
    def _fit_distributed(self, ds, name: str, cols: list[str], value_type) -> None:
        """Vocabulary-bigger-than-driver-memory path (SURVEY.md §7.4.5; the
        reference's ``split_out>1`` analog, categorify.py:1644-1679).

        Counts stay a Ray Dataset end-to-end: map-side value counts ->
        ``groupby("value").sum`` (Ray shuffle) -> distributed (count desc,
        value asc) sort -> block-wise global rank assignment from block
        METADATA (row counts only; no vocab rows ever reach the driver) ->
        sharded vocab parquet written by remote tasks. Encoding is a shuffle
        join (``join_encode``). List (multi-hot) columns fit over their
        FLATTENED element values (reference categorify.py:1695-1705) and
        encode through ``_join_encode_list_col``."""
        import ray

        schema = dataset_arrow_schema(ds)
        types = dict(zip(schema.names, schema.types))

        def partial(t: pa.Table, cols=tuple(cols)) -> pa.Table:
            vals, cnts, nulls = [], [], 0
            for c in cols:
                arr = as_single_chunk(t.column(c))
                if is_list_type(arr.type):
                    arr = arr.flatten()
                nulls += arr.null_count
                vc = pc.value_counts(arr.drop_null())
                vals.append(vc.field("values"))
                cnts.append(pc.cast(vc.field("counts"), pa.int64()))
            value = pa.concat_arrays([v.cast(vals[0].type) for v in vals])
            out = pa.table({"value": value, "count": pa.concat_arrays(cnts)})
            if out.num_rows == 0 and nulls:
                # all-null batch: sentinel row carries the null count
                out = pa.table(
                    {"value": pa.nulls(1, vals[0].type), "count": pa.array([0], pa.int64())}
                )
            nulls_col = ([nulls] + [0] * (out.num_rows - 1)) if out.num_rows else []
            return out.append_column("nulls", pa.array(nulls_col, pa.int64()))

        parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # task-based hash exchange (not Ray's sort groupby); the exchange
        # materializes its buckets, so the null-count sum and the rank sort
        # below read the same aggregated-vocab refs instead of re-executing
        # the scan.
        from nvtabular_ray.functions.aggregates import bucketed_aggregate

        counts = bucketed_aggregate(parts, ["value"], {"count": "sum", "nulls": "sum"})
        nulls_total = int(counts.sum("sum(nulls)") or 0)

        thresh = self.freq_threshold if self.freq_threshold and self.freq_threshold > 1 else None

        def tidy(t: pa.Table) -> pa.Table:
            t = pa.table({"value": t.column("value"), "count": t.column("sum(count)")})
            # count >= 1 drops the all-null sentinel rows from the vocab
            t = t.filter(pc.greater_equal(t.column("count"), thresh or 1))
            return t

        ranked = counts.map_batches(tidy, batch_format="pyarrow").sort(
            ["count", "value"], descending=[True, False]
        )
        if self.max_size:
            keep = self.max_size - OOV_OFFSET - self.num_oov
            if keep < 1:
                raise ValueError("max_size cannot be less than num_buckets + 3")
            ranked = ranked.limit(keep)

        root = self.out_path or tempfile.mkdtemp(prefix="nvtr_vocab_")
        path = os.path.join(root, f"vocab.{name}")
        os.makedirs(path, exist_ok=True)
        base = self.vocab_base
        size_col = f"{name}_size"

        @ray.remote
        def write_shard(block: pa.Table, offset: int, shard_path: str) -> int:
            codes = pa.array(np.arange(block.num_rows, dtype=np.int64) + offset + base)
            pq.write_table(
                pa.table(
                    {
                        "value": block.column("value"),
                        size_col: block.column("count"),
                        "__code__": codes,
                    }
                ),
                shard_path,
            )
            return block.num_rows

        mat = ranked.materialize()
        futures, offset = [], 0
        i = 0
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                n = meta.num_rows
                if n is None:
                    n = ray.get(ref).num_rows
                if n == 0:
                    continue
                futures.append(
                    write_shard.remote(ref, offset, os.path.join(path, f"part-{i:05d}.parquet"))
                )
                offset += n
                i += 1
        ray.get(futures)
        t0 = types[cols[0]]
        self.distributed_vocabs[name] = {
            "path": path,
            "cols": list(cols),
            "num_rows": offset,
            "value_type": str(t0.value_type if is_list_type(t0) else t0),
        }
        self.null_counts[name] = nulls_total
        for c in cols:
            dep = f"__catcode_{c}__"
            if dep not in self.dependencies:
                self.dependencies.append(dep)

    def pre_transform_stage(self, ds):
        return self.join_encode(ds) if self.distributed_vocabs else ds

    def join_encode(self, ds):
        """Shuffle-join encode for distributed vocabularies.

        FULL rows ride exactly ONE exchange regardless of how many columns
        encode (k independent full-row exchanges would move the whole
        dataset k times — >= k x 100 TB of exchange traffic at design
        scale). Physical plan:

          1. uid stamp: every row gets a run-unique ``__uid__`` from a
             stride-granting allocator actor, on a materialized snapshot
             (uids are run-scoped, so the downstream consumers must read
             identical blocks — lazy re-execution would re-allocate).
          2. per column, a NARROW exchange: (uid[, pos], value) rows union
             the sharded vocab, co-partitioned by hash(value);
             ``index_in`` resolves codes per bucket -> (uid, pos, code)
             tagged with the column id. List (multi-hot) columns explode
             to one row per element first (reference encodes list columns
             through every path, categorify.py:1695-1705).
          3. ONE reassembly exchange by hash(uid): full rows + every
             column's code rows; scalars attach via a sorted-uid gather,
             lists rebuild in element order. Appends int64 (or list<int64>)
             ``__catcode_{col}__`` per column; ``transform`` then just
             projects them (op ``dependencies`` mechanism).
        """
        if not self.distributed_vocabs:
            return ds
        from nvtabular_ray.pipelines.partitioned import _default_num_buckets

        num_buckets = self.split_out or _default_num_buckets()
        data_schema = dataset_arrow_schema(ds)
        data_names = list(data_schema.names)
        data_types = dict(zip(data_schema.names, data_schema.types))

        cols_meta = []
        for name, info in self.distributed_vocabs.items():
            if info.get("combo"):
                # one code per TUPLE: a single narrow exchange keyed on the
                # injective tuple composite resolves the whole group
                cols_meta.append(
                    {
                        "colid": len(cols_meta),
                        "col": None,
                        "cols": list(info["cols"]),
                        "dep": f"__catcode_{name}__",
                        "is_list": False,
                        "use_large": False,
                        "vtype": None,
                        "vtypes": [data_types[c] for c in info["cols"]],
                        "combo": True,
                        "info": info,
                    }
                )
                continue
            for col in info["cols"]:
                ctype = data_types[col]
                is_l = is_list_type(ctype)
                cols_meta.append(
                    {
                        "colid": len(cols_meta),
                        "col": col,
                        "dep": f"__catcode_{col}__",
                        "is_list": is_l,
                        "use_large": pa.types.is_large_list(ctype),
                        "vtype": ctype.value_type if is_l else ctype,
                        "info": info,
                    }
                )

        if len(cols_meta) == 1 and not cols_meta[0]["is_list"] and not cols_meta[0].get("combo"):
            # single scalar column: the legacy one-exchange plan is optimal
            # (full rows ride THE value exchange directly; the unified plan
            # would pay a snapshot + an extra reassembly exchange for no
            # traffic savings when k == 1)
            m = cols_meta[0]
            return self._join_encode_single_scalar(
                ds, m, data_names, data_types, num_buckets
            )

        stamped = self._stamp_uids(ds)
        codes_all = None
        for m in cols_meta:
            part = self._encode_codes(stamped, m, num_buckets)
            codes_all = part if codes_all is None else codes_all.union(part)
        return self._assemble_codes(
            stamped, codes_all, cols_meta, data_names, data_types, num_buckets
        )

    def _join_encode_single_scalar(self, ds, m: dict, data_names, data_types, num_buckets):
        """k == 1 scalar fast path: ONE bucketed exchange by hash(value)
        carries the full rows together with the vocab shards; codes resolve
        in place. (With k >= 2 columns or list columns the unified
        stamp/narrow/assemble plan in ``join_encode`` bounds full-row
        movement to one exchange instead of k.)"""
        import ray.data as rd

        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        col, vtype, dep = m["col"], m["vtype"], m["dep"]
        num_oov = self.num_oov
        vocab = rd.read_parquet(m["info"]["path"])

        def pad_data(t: pa.Table) -> pa.Table:
            h = hash64(as_single_chunk(t.column(col)))
            b = (h % np.uint64(num_buckets)).astype(np.int32)
            t = t.append_column("__vbkt__", pa.array(b))
            t = t.append_column("__vcode__", pa.nulls(t.num_rows, pa.int64()))
            t = t.append_column("__vside__", pa.array(np.zeros(t.num_rows, np.int8)))
            return t

        def pad_vocab(t: pa.Table) -> pa.Table:
            vals = as_single_chunk(t.column("value").cast(vtype))
            h = hash64(vals)
            b = (h % np.uint64(num_buckets)).astype(np.int32)
            out = {
                c2: (vals if c2 == col else pa.nulls(t.num_rows, data_types[c2]))
                for c2 in data_names
            }
            out["__vbkt__"] = pa.array(b)
            out["__vcode__"] = t.column("__code__").cast(pa.int64())
            out["__vside__"] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(out)

        order = data_names + ["__vbkt__", "__vcode__", "__vside__"]
        both = (
            ds.map_batches(pad_data, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(order)
            .union(vocab.map_batches(pad_vocab, batch_format="pyarrow").select_columns(order))
        )

        def per_bucket(t: pa.Table) -> pa.Table:
            side = t.column("__vside__").to_numpy(zero_copy_only=False)
            vtab = t.filter(pa.array(side == 1))
            dtab = t.filter(pa.array(side == 0))
            vocab_vals = as_single_chunk(vtab.column(col))
            vocab_codes = vtab.column("__vcode__").to_numpy(zero_copy_only=False)
            values = as_single_chunk(dtab.column(col))
            idx = (
                pc.index_in(values, value_set=vocab_vals)
                .to_numpy(zero_copy_only=False)
                .astype("float64")
            )
            found = ~np.isnan(idx)
            nulls = pc.is_null(values).to_numpy(zero_copy_only=False)
            codes = np.empty(len(values), dtype=np.int64)
            codes[found] = vocab_codes[idx[found].astype(np.int64)].astype(np.int64)
            oov = (~found) & (~nulls)
            if oov.any():
                if num_oov == 1:
                    codes[oov] = OOV_OFFSET
                else:
                    # persisted codes: version-stable hash (see hashing.py)
                    codes[oov] = (
                        hash64_stable(values)[oov] % np.uint64(num_oov)
                    ).astype(np.int64) + OOV_OFFSET
            codes[nulls] = NULL_OFFSET
            out = dtab.drop_columns(["__vbkt__", "__vcode__", "__vside__"])
            return out.append_column(dep, pa.array(codes, pa.int64()))

        return bucketed_group_map(both, ["__vbkt__"], [], per_bucket, num_buckets=num_buckets)

    def _stamp_uids(self, ds):
        """Materialized snapshot of ``ds`` + run-unique int64 ``__uid__``.

        uid ranges come from ONE allocator actor (monotonic counter), so
        they are collision-FREE by construction — a random per-batch base
        + arange can overlap another batch's range (P ~ batches^2 *
        rows/2^64, non-negligible at the 10^12-row design scale) and a
        collision silently merges two rows' code lists at reassembly.
        Ranges are granted in 16M-row strides served from a worker-local
        stash, so the single actor sees O(rows/stride) RPCs, not one per
        batch."""
        import ray as _ray

        @_ray.remote(num_cpus=0)
        class _UidRanges:
            def __init__(self):
                self._next = 0

            def alloc(self, k: int) -> int:
                base = self._next
                self._next += int(k)
                return base

        allocator = _UidRanges.remote()
        stride = 1 << 24

        def add_uid(t: pa.Table, _stash={}) -> pa.Table:
            n = t.num_rows
            lo, hi = _stash.get("r", (0, 0))
            if hi - lo < n:
                lo = _ray.get(allocator.alloc.remote(max(n, stride)))
                hi = lo + max(n, stride)
            uid = lo + np.arange(n, dtype=np.int64)
            _stash["r"] = (lo + n, hi)
            return t.append_column("__uid__", pa.array(uid))

        return ds.map_batches(
            add_uid, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

    def _encode_codes(self, stamped, m: dict, num_buckets: int):
        """NARROW per-column value exchange: (uid[, pos], value) rows union
        the sharded vocab by hash(value); per bucket ``index_in`` resolves
        codes. Returns a (uid, pos, code, colid) Dataset — no data-row
        payload ever enters this exchange."""
        import ray.data as rd

        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        if m.get("combo"):
            return self._encode_codes_combo(stamped, m, num_buckets)

        col, vtype, colid = m["col"], m["vtype"], m["colid"]
        num_oov = self.num_oov
        vocab = rd.read_parquet(m["info"]["path"])
        narrow = stamped.select_columns(["__uid__", col])

        if m["is_list"]:

            def expand(t: pa.Table) -> pa.Table:
                arr = as_single_chunk(t.column(col))
                uid = t.column("__uid__").to_numpy(zero_copy_only=False)
                off = np.asarray(arr.offsets, dtype=np.int64)
                lens = np.diff(off)
                if arr.null_count:
                    # a null list row may legally carry a nonzero offset
                    # span; flatten() below SKIPS those child values, so
                    # zero the row's len or every later (uid, pos) pairing
                    # in this batch desyncs — and a null row must emit no
                    # code rows at all (it reassembles as a NULL list)
                    valid = ~pc.is_null(arr).to_numpy(zero_copy_only=False)
                    lens = np.where(valid, lens, 0)
                values = arr.flatten()
                total = int(lens.sum())
                starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
                pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
                h = hash64(values)
                return pa.table(
                    {
                        "__vbkt__": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                        "__val__": values,
                        "__uid__": pa.array(np.repeat(uid, lens)),
                        "__pos__": pa.array(pos),
                        "__vcode__": pa.nulls(total, pa.int64()),
                        "__vside__": pa.array(np.zeros(total, np.int8)),
                    }
                )

        else:

            def expand(t: pa.Table) -> pa.Table:
                vals = as_single_chunk(t.column(col))
                h = hash64(vals)
                n = t.num_rows
                return pa.table(
                    {
                        "__vbkt__": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                        "__val__": vals,
                        "__uid__": t.column("__uid__"),
                        "__pos__": pa.nulls(n, pa.int64()),
                        "__vcode__": pa.nulls(n, pa.int64()),
                        "__vside__": pa.array(np.zeros(n, np.int8)),
                    }
                )

        def pad_vocab(t: pa.Table) -> pa.Table:
            vals = as_single_chunk(t.column("value").cast(vtype))
            h = hash64(vals)
            n = t.num_rows
            return pa.table(
                {
                    "__vbkt__": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                    "__val__": vals,
                    "__uid__": pa.nulls(n, pa.int64()),
                    "__pos__": pa.nulls(n, pa.int64()),
                    "__vcode__": t.column("__code__").cast(pa.int64()),
                    "__vside__": pa.array(np.ones(n, np.int8)),
                }
            )

        both = narrow.map_batches(
            expand, batch_format="pyarrow", zero_copy_batch=True
        ).union(vocab.map_batches(pad_vocab, batch_format="pyarrow"))

        def encode_bucket(t: pa.Table) -> pa.Table:
            side = t.column("__vside__").to_numpy(zero_copy_only=False)
            vtab = t.filter(pa.array(side == 1))
            dtab = t.filter(pa.array(side == 0))
            vocab_vals = as_single_chunk(vtab.column("__val__"))
            vocab_codes = vtab.column("__vcode__").to_numpy(zero_copy_only=False)
            values = as_single_chunk(dtab.column("__val__"))
            idx = (
                pc.index_in(values, value_set=vocab_vals)
                .to_numpy(zero_copy_only=False)
                .astype("float64")
            )
            found = ~np.isnan(idx)
            nulls = pc.is_null(values).to_numpy(zero_copy_only=False)
            codes = np.empty(len(values), dtype=np.int64)
            codes[found] = vocab_codes[idx[found].astype(np.int64)].astype(np.int64)
            oov = (~found) & (~nulls)
            if oov.any():
                if num_oov == 1:
                    codes[oov] = OOV_OFFSET
                else:
                    # persisted codes: version-stable hash (see hashing.py)
                    codes[oov] = (
                        hash64_stable(values)[oov] % np.uint64(num_oov)
                    ).astype(np.int64) + OOV_OFFSET
            codes[nulls] = NULL_OFFSET
            return pa.table(
                {
                    "__uid__": dtab.column("__uid__"),
                    "__pos__": dtab.column("__pos__"),
                    "__code__": pa.array(codes, pa.int64()),
                    "__colid__": pa.array(
                        np.full(dtab.num_rows, colid, np.int32)
                    ),
                }
            )

        return bucketed_group_map(
            both, ["__vbkt__"], [], encode_bucket, num_buckets=num_buckets
        )

    def _encode_codes_combo(self, stamped, m: dict, num_buckets: int):
        """Combo-group narrow exchange: (uid, tuple-composite) rows union the
        sharded tuple vocab by hash(composite); per bucket ``index_in`` on
        the injective composite resolves one code per ROW. OOV tuples hash
        the ORIGINAL member columns with the version-stable hash so codes
        match the broadcast ``_encode_combo`` exactly; any-null-member rows
        composite to null -> NULL code."""
        import ray.data as rd

        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        gcols, colid, vtypes = m["cols"], m["colid"], m["vtypes"]
        num_oov = self.num_oov
        vocab = rd.read_parquet(m["info"]["path"])
        narrow = stamped.select_columns(["__uid__"] + gcols)

        def expand(t: pa.Table) -> pa.Table:
            comp = _combo_composite(t, gcols)
            h = hash64(comp)
            n = t.num_rows
            # stable per-row tuple hash rides the exchange so the bucket can
            # assign broadcast-identical OOV codes (int64 view, exact bits)
            oovh = hash64_columns_stable(t, gcols).view(np.int64)
            return pa.table(
                {
                    "__vbkt__": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                    "__val__": comp,
                    "__uid__": t.column("__uid__"),
                    "__pos__": pa.nulls(n, pa.int64()),
                    "__vcode__": pa.nulls(n, pa.int64()),
                    "__oovh__": pa.array(oovh),
                    "__vside__": pa.array(np.zeros(n, np.int8)),
                }
            )

        def pad_vocab(t: pa.Table) -> pa.Table:
            cast_tbl = pa.table(
                {c: as_single_chunk(t.column(c)).cast(vt) for c, vt in zip(gcols, vtypes)}
            )
            comp = _combo_composite(cast_tbl, gcols)
            h = hash64(comp)
            n = t.num_rows
            return pa.table(
                {
                    "__vbkt__": pa.array((h % np.uint64(num_buckets)).astype(np.int32)),
                    "__val__": comp,
                    "__uid__": pa.nulls(n, pa.int64()),
                    "__pos__": pa.nulls(n, pa.int64()),
                    "__vcode__": t.column("__code__").cast(pa.int64()),
                    "__oovh__": pa.array(np.zeros(n, np.int64)),
                    "__vside__": pa.array(np.ones(n, np.int8)),
                }
            )

        both = narrow.map_batches(
            expand, batch_format="pyarrow", zero_copy_batch=True
        ).union(vocab.map_batches(pad_vocab, batch_format="pyarrow"))

        def encode_bucket(t: pa.Table) -> pa.Table:
            side = t.column("__vside__").to_numpy(zero_copy_only=False)
            vtab = t.filter(pa.array(side == 1))
            dtab = t.filter(pa.array(side == 0))
            vocab_vals = as_single_chunk(vtab.column("__val__"))
            vocab_codes = vtab.column("__vcode__").to_numpy(zero_copy_only=False)
            values = as_single_chunk(dtab.column("__val__"))
            idx = (
                pc.index_in(values, value_set=vocab_vals)
                .to_numpy(zero_copy_only=False)
                .astype("float64")
            )
            found = ~np.isnan(idx)
            nulls = pc.is_null(values).to_numpy(zero_copy_only=False)
            codes = np.empty(len(values), dtype=np.int64)
            codes[found] = vocab_codes[idx[found].astype(np.int64)].astype(np.int64)
            oov = (~found) & (~nulls)
            if oov.any():
                oovh = (
                    dtab.column("__oovh__")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                codes[oov] = (oovh[oov] % np.uint64(num_oov)).astype(np.int64) + OOV_OFFSET
            codes[nulls] = NULL_OFFSET
            return pa.table(
                {
                    "__uid__": dtab.column("__uid__"),
                    "__pos__": dtab.column("__pos__"),
                    "__code__": pa.array(codes, pa.int64()),
                    "__colid__": pa.array(np.full(dtab.num_rows, colid, np.int32)),
                }
            )

        return bucketed_group_map(
            both, ["__vbkt__"], [], encode_bucket, num_buckets=num_buckets
        )

    def _assemble_codes(
        self, stamped, codes_all, cols_meta, data_names, data_types, num_buckets
    ):
        """The single full-row exchange: stamped rows + every column's code
        rows co-partitioned by hash(uid); per bucket each column attaches
        its codes (scalar: sorted-uid gather; list: rebuild in (uid, pos)
        order)."""
        from nvtabular_ray.pipelines.partitioned import bucketed_group_map

        row_names = data_names + ["__uid__"]

        def pad_rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            t = t.append_column("__pos__", pa.nulls(n, pa.int64()))
            t = t.append_column("__code__", pa.nulls(n, pa.int64()))
            t = t.append_column("__colid__", pa.array(np.full(n, -1, np.int32)))
            return t.append_column("__rside__", pa.array(np.zeros(n, np.int8)))

        def pad_codes(t: pa.Table) -> pa.Table:
            out = {c: pa.nulls(t.num_rows, data_types[c]) for c in data_names}
            out["__uid__"] = t.column("__uid__")
            out["__pos__"] = t.column("__pos__")
            out["__code__"] = t.column("__code__")
            out["__colid__"] = t.column("__colid__")
            out["__rside__"] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(out)

        order = row_names + ["__pos__", "__code__", "__colid__", "__rside__"]
        both2 = (
            stamped.map_batches(pad_rows, batch_format="pyarrow", zero_copy_batch=True)
            .select_columns(order)
            .union(codes_all.map_batches(pad_codes, batch_format="pyarrow").select_columns(order))
        )
        drop_cols = ["__uid__", "__pos__", "__code__", "__colid__", "__rside__"]

        def assemble_bucket(t: pa.Table) -> pa.Table:
            side = t.column("__rside__").to_numpy(zero_copy_only=False)
            call = t.filter(pa.array(side == 1))
            dtab = t.filter(pa.array(side == 0))
            duid = dtab.column("__uid__").to_numpy(zero_copy_only=False)
            colid_all = call.column("__colid__").to_numpy(zero_copy_only=False)
            uid_all = call.column("__uid__").to_numpy(zero_copy_only=False)
            pos_all = call.column("__pos__").to_numpy(zero_copy_only=False)
            code_all = call.column("__code__").to_numpy(zero_copy_only=False)
            out = dtab.drop_columns(drop_cols)
            for m in cols_meta:
                mine = colid_all == m["colid"]
                uid_c, code_c = uid_all[mine], code_all[mine]
                if not m["is_list"]:
                    sorder = np.argsort(uid_c, kind="stable")
                    uid_s, code_s = uid_c[sorder], code_c[sorder]
                    posm = (
                        np.minimum(np.searchsorted(uid_s, duid), max(len(uid_s) - 1, 0))
                        if len(uid_s)
                        else np.zeros(len(duid), np.int64)
                    )
                    hasc = (uid_s[posm] == duid) if len(uid_s) else np.zeros(len(duid), bool)
                    codes = np.where(hasc, code_s[posm] if len(uid_s) else 0, NULL_OFFSET)
                    out = out.append_column(m["dep"], pa.array(codes.astype(np.int64), pa.int64()))
                    continue
                pos_c = pos_all[mine]
                sorder = np.lexsort((pos_c, uid_c))
                uid_s, code_s = uid_c[sorder], code_c[sorder]
                change = (
                    np.r_[True, uid_s[1:] != uid_s[:-1]] if len(uid_s) else np.empty(0, bool)
                )
                gstarts = np.flatnonzero(change)
                gcounts = np.diff(np.r_[gstarts, len(uid_s)])
                guids = uid_s[gstarts]
                posm = (
                    np.minimum(np.searchsorted(guids, duid), max(len(guids) - 1, 0))
                    if len(guids)
                    else np.zeros(len(duid), np.int64)
                )
                hasc = (guids[posm] == duid) if len(guids) else np.zeros(len(duid), bool)
                row_lens = np.where(hasc, gcounts[posm] if len(guids) else 0, 0).astype(np.int64)
                out_off = np.concatenate([[0], np.cumsum(row_lens)])
                total = int(out_off[-1])
                gather = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(out_off[:-1], row_lens)
                    + (np.repeat(gstarts[posm], row_lens) if total else np.empty(0, np.int64))
                )
                child = pa.array(code_s[gather] if total else np.empty(0, np.int64), pa.int64())
                # NULL input rows emitted no code rows (see expand), which
                # alone would reassemble as EMPTY lists; carry the source
                # column's validity so null rows stay null (broadcast-path
                # parity: map_list_values preserves nulls via mask=)
                src = as_single_chunk(dtab.column(m["col"]))
                mask = pc.is_null(src) if src.null_count else None
                if m["use_large"]:
                    lst = pa.LargeListArray.from_arrays(
                        pa.array(out_off, pa.int64()), child, mask=mask
                    )
                else:
                    lst = pa.ListArray.from_arrays(
                        pa.array(out_off, pa.int32()), child, mask=mask
                    )
                out = out.append_column(m["dep"], lst)
            return out

        return bucketed_group_map(
            both2, ["__uid__"], [], assemble_bucket, num_buckets=num_buckets
        )


    def _check_vocab_size(self, name, vocab_df):
        nbytes = int(vocab_df.memory_usage(deep=True).sum())
        if nbytes > self.cardinality_memory_limit:
            raise MemoryError(
                f"vocabulary for {name} is {nbytes} bytes > cardinality_memory_limit; "
                "raise the limit or use num_buckets/max_size to cap the vocab"
            )

    def _finalize_vocab(self, name, value_col, vocab_df: pd.DataFrame, nulls: int, value_cols=None):
        """Deterministic (count desc, value asc) ordering + threshold/size caps."""
        sort_cols = value_cols if value_cols else ["value"]
        vocab_df = vocab_df.sort_values(
            ["count"] + sort_cols, ascending=[False] + [True] * len(sort_cols), kind="mergesort"
        ).reset_index(drop=True)
        if self.freq_threshold and self.freq_threshold > 1:
            vocab_df = vocab_df[vocab_df["count"] >= self.freq_threshold]
        if self.max_size:
            keep = self.max_size - OOV_OFFSET - self.num_oov
            if keep < 1:
                raise ValueError("max_size cannot be less than num_buckets + 3")
            vocab_df = vocab_df.head(keep)
        if value_cols:
            data = {c: pa.Array.from_pandas(vocab_df[c]) for c in value_cols}
        else:
            data = {value_col if isinstance(value_col, str) else name: pa.Array.from_pandas(vocab_df["value"])}
        data[f"{name}_size"] = pa.Array.from_pandas(vocab_df["count"].astype("int64"))
        self.vocab_tables[name] = pa.table(data)
        self.null_counts[name] = nulls

    def _write_artifacts(self):
        if not self.out_path:
            return
        os.makedirs(self.out_path, exist_ok=True)
        for name, tab in self.vocab_tables.items():
            pq.write_table(tab, os.path.join(self.out_path, f"unique.{name}.parquet"))
            meta = pa.table(
                {
                    "kind": pa.array([name]),
                    "num_observed": pa.array([tab.num_rows], pa.int64()),
                    "nulls": pa.array([self.null_counts.get(name, 0)], pa.int64()),
                    "offset": pa.array([self.vocab_base], pa.int64()),
                }
            )
            pq.write_table(meta, os.path.join(self.out_path, f"meta.{name}.parquet"))
        for name, info in self.distributed_vocabs.items():
            meta = pa.table(
                {
                    "kind": pa.array([name]),
                    "num_observed": pa.array([info["num_rows"]], pa.int64()),
                    "nulls": pa.array([self.null_counts.get(name, 0)], pa.int64()),
                    "offset": pa.array([self.vocab_base], pa.int64()),
                }
            )
            pq.write_table(meta, os.path.join(self.out_path, f"meta.{name}.parquet"))

    def lineage_metrics(self, out: pa.Table) -> dict:
        """Per-partition OOV-rate counters for the resumable-run lineage
        records (SURVEY §7.5): fraction of encoded values that landed in
        the OOV range [OOV_OFFSET, OOV_OFFSET + num_oov)."""
        metrics = {}
        hi = OOV_OFFSET + self.num_oov
        for name in self.vocab_tables or self.distributed_vocabs:
            if name not in out.column_names:
                continue
            arr = as_single_chunk(out.column(name))
            if is_list_type(arr.type):
                arr = arr.flatten()
            n = len(arr)
            if not n:
                continue
            oov = pc.sum(
                pc.and_(
                    pc.greater_equal(arr, pa.scalar(OOV_OFFSET, arr.type)),
                    pc.less(arr, pa.scalar(hi, arr.type)),
                )
            ).as_py() or 0
            metrics[f"oov_rate_{name}"] = round(oov / n, 6)
        return metrics

    def clear(self):
        super().clear()
        self.vocab_tables, self.null_counts, self._refs = {}, {}, {}
        self.distributed_vocabs, self.dependencies = {}, []
        self._single_offsets, self._ss_cache, self._disk_paths = {}, {}, {}

    # -------------------------------------------------------- broadcast --
    @property
    def needs_actor(self) -> bool:
        if self._refs or self._disk_paths:
            return True
        return (
            sum(t.nbytes for t in self.vocab_tables.values() if t is not None)
            > _BROADCAST_BYTES
        )

    def prepare_broadcast(self):
        self._combo_pd_cache = {}  # never pickle the pandas copies to actors
        if self.cat_cache == "disk":
            # middle tier: vocab parquet on disk, loaded + LRU-cached per
            # worker PROCESS (reference cat_cache="disk",
            # categorify.py:169-173,1627-1643) — keeps 1-50GB vocabs out of
            # the object store on long runs
            for name, tab in list(self.vocab_tables.items()):
                if isinstance(tab, pa.Table) and tab.nbytes > _BROADCAST_BYTES:
                    if name not in self._disk_paths:
                        d = self.out_path or tempfile.mkdtemp(prefix="nvtr_catcache_")
                        os.makedirs(d, exist_ok=True)
                        path = os.path.join(d, f"cache.{name}.parquet")
                        pq.write_table(tab, path)
                        self._disk_paths[name] = path
                    self.vocab_tables[name] = None
            return
        import ray

        if not ray.is_initialized():
            return
        for name, tab in list(self.vocab_tables.items()):
            if isinstance(tab, pa.Table) and tab.nbytes > _BROADCAST_BYTES:
                self._refs[name] = ray.put(tab)
                self.vocab_tables[name] = None

    def resolve_broadcast(self):
        # vocab tables may be (re)loaded here — drop any sorted-vocab cache
        # built against the previous table objects
        self._ss_cache = {}
        for name, path in self._disk_paths.items():
            if self.vocab_tables.get(name) is None:
                self.vocab_tables[name] = _disk_cache_read(path)
        if not self._refs:
            return
        import ray

        for name, ref in self._refs.items():
            if self.vocab_tables.get(name) is None:
                self.vocab_tables[name] = ray.get(ref)

    # -------------------------------------------------------- transform --
    def column_mapping(self, col_selector):
        mapping = {}
        for name, cols in self._groups(col_selector):
            if len(cols) > 1 and self.encode_type == "combo":
                mapping[name] = cols
            else:
                for c in cols:
                    mapping[c] = [c]
        return mapping

    def transform(self, col_selector, table: pa.Table) -> pa.Table:
        out = {}
        for name, cols in self._groups(col_selector):
            if name in self.distributed_vocabs:
                # codes were resolved by the join_encode shuffle stage and
                # ride in as dependency columns — just project them
                if len(cols) > 1 and self.encode_type == "combo":
                    out[name] = table.column(f"__catcode_{name}__")
                else:
                    for c in cols:
                        out[c] = table.column(f"__catcode_{c}__")
            elif len(cols) > 1 and self.encode_type == "combo":
                out[name] = self._encode_combo(name, cols, table)
            else:
                vocab = self.vocab_tables[name]
                value_col = cols[0] if len(cols) == 1 else name
                vocab_values = as_single_chunk(vocab.column(vocab.column_names[0]))
                for c in cols:
                    out[c] = self._encode_column(table.column(c), vocab_values, cache_key=name)
        # preserve selector order for 1-to-1 outputs
        ordered = {}
        for name, cols in self._groups(col_selector):
            if len(cols) > 1 and self.encode_type == "combo":
                ordered[name] = out[name]
            else:
                for c in cols:
                    ordered[c] = out[c]
        if self.single_table and self._single_offsets:
            for name, cols in self._groups(col_selector):
                off = self._single_offsets.get(name, 0)
                if not off:
                    continue
                outs = [name] if (len(cols) > 1 and self.encode_type == "combo") else cols
                for c in outs:
                    arr = as_single_chunk(ordered[c])
                    if is_list_type(arr.type):
                        ordered[c] = map_list_values(
                            arr, lambda v, off=off: pc.add(v, off)
                        )
                    else:
                        ordered[c] = pc.add(arr, off)
        if self.dtype is not None:
            target = (
                self.dtype
                if isinstance(self.dtype, pa.DataType)
                else pa.from_numpy_dtype(np.dtype(self.dtype))
            )

            def cast_codes(v):
                # list (multi-hot) codes cast ELEMENT-wise — a direct cast
                # of list<int64> to a scalar dtype is unsupported, and
                # compute_output_schema declares list_(dtype) for them
                v = as_single_chunk(v) if isinstance(v, pa.ChunkedArray) else v
                if is_list_type(v.type):
                    t = (
                        pa.large_list(target)
                        if pa.types.is_large_list(v.type)
                        else pa.list_(target)
                    )
                    return pc.cast(v, t)
                return pc.cast(v, target)

            ordered = {k: cast_codes(v) for k, v in ordered.items()}
        return pa.table(ordered)

    def _encode_values(
        self, values: pa.Array, vocab_values: pa.Array, cache_key: str = ""
    ) -> np.ndarray:
        """Vectorized code assignment for a flat value array."""
        if len(vocab_values) and values.type != vocab_values.type:
            values = values.cast(vocab_values.type)
        if self.search_sorted and len(vocab_values):
            return self._encode_search_sorted(values, vocab_values, cache_key)
        idx = pc.index_in(values, value_set=vocab_values)
        idx_np = idx.to_numpy(zero_copy_only=False).astype("float64")
        null_mask = pc.is_null(values).to_numpy(zero_copy_only=False)
        found = ~np.isnan(idx_np)
        codes = np.empty(len(values), dtype=np.int64)
        codes[found] = idx_np[found].astype(np.int64) + self.vocab_base
        oov_mask = (~found) & (~null_mask)
        if oov_mask.any():
            if self.num_oov == 1:
                codes[oov_mask] = OOV_OFFSET
            else:
                # persisted codes: version-stable hash (see hashing.py)
                h = hash64_stable(values)[oov_mask]
                codes[oov_mask] = (h % np.uint64(self.num_oov)).astype(np.int64) + OOV_OFFSET
        codes[null_mask] = NULL_OFFSET
        return codes

    def _encode_search_sorted(
        self, values: pa.Array, vocab_values: pa.Array, cache_key: str
    ) -> np.ndarray:
        """Binary-search encode (reference search_sorted, categorify.py:180):
        vocab is sorted ONCE per worker (cached), each batch is one
        np.searchsorted — faster than hash lookup for sorted int vocabs.
        Codes are identical to the index_in path (guarded in __init__ against
        freq_threshold/num_buckets, so OOV is the single index 2).

        The cache is keyed by the GROUP NAME (stable across batches) — an
        id()-based key can alias a freed wrapper from another column and
        silently encode against the wrong sorted vocab, and never hits across
        batches because transform rebuilds the Array wrapper per batch."""
        cached = self._ss_cache.get(cache_key)
        if cached is None:
            v_np = vocab_values.to_numpy(zero_copy_only=False)
            order = np.argsort(v_np, kind="mergesort")
            cached = (v_np[order], order.astype(np.int64))
            self._ss_cache[cache_key] = cached
        sv, order = cached
        null_mask = pc.is_null(values).to_numpy(zero_copy_only=False)
        filled = values.fill_null(vocab_values[0].as_py()) if null_mask.any() else values
        vals_np = filled.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sv, vals_np)
        pos_c = np.minimum(pos, len(sv) - 1)
        found = sv[pos_c] == vals_np
        codes = np.full(len(vals_np), OOV_OFFSET, dtype=np.int64)
        codes[found] = order[pos_c[found]] + self.vocab_base
        codes[null_mask] = NULL_OFFSET
        return codes

    def _encode_column(self, arr, vocab_values: pa.Array, cache_key: str = ""):
        arr = as_single_chunk(arr)
        if is_list_type(arr.type):
            return map_list_values(
                arr,
                lambda v: pa.array(self._encode_values(v, vocab_values, cache_key), pa.int64()),
            )
        return pa.array(self._encode_values(arr, vocab_values, cache_key), pa.int64())

    def _encode_combo(self, name: str, cols: list[str], table: pa.Table) -> pa.Array:
        vocab = self.vocab_tables[name]
        left = table.select(cols).to_pandas()
        # memoize the vocab->pandas(+code column) build per group so the
        # per-batch hot path doesn't re-copy a broadcast vocab every batch;
        # identity check against the live table (reference pins its id)
        cache = getattr(self, "_combo_pd_cache", None)
        if cache is None:
            cache = self._combo_pd_cache = {}
        hit = cache.get(name)
        if hit is not None and hit[0] is vocab:
            vdf = hit[1]
        else:
            vdf = vocab.to_pandas()
            vdf["__code__"] = np.arange(len(vdf), dtype=np.int64) + self.vocab_base
            cache[name] = (vocab, vdf)
        merged = left.merge(vdf[cols + ["__code__"]], on=cols, how="left")
        codes = merged["__code__"].to_numpy(dtype="float64", na_value=np.nan)
        out = np.empty(len(left), dtype=np.int64)
        found = ~np.isnan(codes)
        out[found] = codes[found].astype(np.int64)
        null_mask = left[cols].isna().any(axis=1).to_numpy()
        oov_mask = (~found) & (~null_mask)
        if oov_mask.any():
            # persisted codes: version-stable hash (see hashing.py)
            h = hash64_columns_stable(table, cols)[oov_mask]
            out[oov_mask] = (h % np.uint64(self.num_oov)).astype(np.int64) + OOV_OFFSET
        out[null_mask] = NULL_OFFSET
        return pa.array(out, pa.int64())


def get_embedding_sizes(source) -> dict[str, tuple[int, int]]:
    """(cardinality, embedding dim) per encoded column; dim rule
    min(max(16, round(1.6 * card**0.56)), 512)
    (reference categorify.py:616-688, rule at :687)."""
    ops = []
    if isinstance(source, Categorify):
        ops = [source]
    else:  # Workflow
        ops = [n.op for n in source._op_nodes() if isinstance(n.op, Categorify)]
    out = {}
    for op in ops:
        sizes = {name: tab.num_rows for name, tab in op.vocab_tables.items()}
        sizes.update({name: info["num_rows"] for name, info in op.distributed_vocabs.items()})
        for name, nrows in sizes.items():
            card = op.vocab_base + nrows
            dim = min(max(16, int(round(1.6 * card**0.56))), 512)
            out[name] = (card, dim)
    return out
