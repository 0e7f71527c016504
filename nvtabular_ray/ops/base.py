"""Operator contracts.

Re-cut of the reference's operator model for Ray Data:

- ``Operator.transform(col_selector, table)`` — stateless, batch-local,
  Arrow-in/Arrow-out; returns a table containing the op's OUTPUT columns only.
  (Reference: ``Operator.transform(col_selector, df) -> df`` partition-local
  contract, visible at e.g. /root/reference/nvtabular/ops/clip.py:49.)
- ``StatOperator.fit(col_selector, ds)`` — runs Ray Data jobs (map_batches
  partials, groupby shuffles) and stores fitted state on the op. (Reference:
  fit/fit_finalize returning Dask Delayed graphs,
  /root/reference/nvtabular/ops/normalize.py:62-68,
  /root/reference/nvtabular/workflow/workflow.py:209.)

Extra flags (new scope vs reference, SURVEY.md §7):

- ``partition_cols`` / ``sort_cols`` on an op mark it as *partitioned*: it
  needs all rows of one entity (e.g. conv_id) contiguous and ordered. The
  workflow compiler then runs the whole DAG inside a bucketed
  ``groupby().map_groups`` shuffle (see pipelines/partitioned.py) instead of
  plain ``map_batches`` — making the reference's "you must pre-shuffle by key
  yourself" footgun (groupby.py:32-40, difference_lag.py:27-38) impossible.
- ``is_dataset_level`` marks ops that change row cardinality via a shuffle
  (Groupby): they run as a dedicated Ray Data stage, terminal in the DAG.
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa

from nvtabular_ray.selector import ColumnSelector


class Operator:
    # extra columns pulled from the ROOT table into this op's input
    # (reference: `dependencies` property, target_encoding.py:222-224)
    dependencies: list[str] = []
    # cardinality/shuffle behavior flags (see module docstring)
    is_dataset_level: bool = False
    partition_cols: Optional[list[str]] = None
    sort_cols: Optional[list[str]] = None
    # set True on ops that may drop rows (Filter/Dropna): they may not feed
    # a branch concat whose other side has a different row count.
    changes_row_count: bool = False

    def __rrshift__(self, left) -> "Node":  # noqa: F821
        """Enables ``["a", "b"] >> Op()`` DSL (reference Workflow DSL,
        /root/reference/nvtabular/workflow/workflow.py:54-57)."""
        from nvtabular_ray.dag import Node

        return Node.from_selection(left) >> self

    # ------------------------------------------------------------------ #
    def column_mapping(self, col_selector: ColumnSelector) -> dict[str, list[str]]:
        """output column -> input columns lineage (reference rename.py:59-78)."""
        return {name: [name] for name in col_selector.names}

    def output_column_names(self, col_selector: ColumnSelector) -> list[str]:
        return list(self.column_mapping(col_selector).keys())

    def transform(self, col_selector: ColumnSelector, table: pa.Table) -> pa.Table:
        raise NotImplementedError

    # Declared output dtype shared by every output column, or None when the
    # dtype is input-dependent (passthrough). Ops with fixed outputs (LogOp
    # float32, Bucketize int32, ...) override this ONE hook; fancier ops
    # override compute_output_schema directly. (Reference analog: dtype
    # propagation + fail-fast validation, workflow.py:125-139.)
    def output_dtype(self):
        return None

    def compute_output_schema(
        self, col_selector: ColumnSelector, input_schema: dict
    ) -> dict[str, "pa.DataType | None"]:
        """output column -> pa.DataType (None = unknown/input-dependent).

        Default: the declared ``output_dtype()`` if fixed, else the dtype of
        the first source column from ``column_mapping`` (passthrough), else
        None. The workflow compiler folds these through the DAG
        (``Workflow.output_schema``) and the fused transform validates the
        first produced batch against the result — a dtype bug raises with
        the op and column named instead of surfacing as a parquet-write
        surprise."""
        fixed = self.output_dtype()
        out: dict[str, pa.DataType | None] = {}
        for out_col, sources in self.column_mapping(col_selector).items():
            if fixed is not None:
                out[out_col] = fixed
            elif sources and sources[0] in input_schema:
                out[out_col] = input_schema[sources[0]]
            else:
                out[out_col] = None
        return out

    # Called once before the transform stage ships to Ray workers: ops with
    # large state (vocabularies, stat tables) swap it for ray.put ObjectRefs
    # so it is stored once in the object store and shared zero-copy by every
    # actor, instead of being re-pickled into each task closure.
    def prepare_broadcast(self) -> None:
        return None

    # Called on the worker (actor __init__ / first task) to turn broadcast
    # ObjectRefs back into usable tables, cached on the op instance.
    def resolve_broadcast(self) -> None:
        return None

    # True when the op holds per-worker state worth amortizing across batches
    # (vocab tables, compiled models) => the workflow uses an actor pool.
    @property
    def needs_actor(self) -> bool:
        return False

    @property
    def label(self) -> str:
        return type(self).__name__

    def __repr__(self):
        return f"<op {self.label}>"


class BroadcastTableState:
    """Mixin managing a dict of (possibly large) fitted pa.Tables.

    On the driver, tables above a size threshold are swapped for ray.put
    ObjectRefs (stored ONCE in the object store); on each worker/actor they
    are ray.get-resolved lazily and cached — the Ray analog of the
    reference's per-worker stat cache (categorify.py:1627-1643).
    """

    _BROADCAST_BYTES = 1 << 20
    _state_attr = "state_tables"

    def _state(self) -> dict:
        return getattr(self, self._state_attr)

    @property
    def needs_actor(self) -> bool:
        tables = self._state()
        return sum(t.nbytes for t in tables.values() if t is not None) > self._BROADCAST_BYTES

    def state_pandas(self, name: str):
        """Memoized pandas view of a fitted state table — the per-batch
        transform hot path must not re-pay a multi-GB Arrow->pandas copy
        (plus merge hash-table build) for EVERY batch; the actor pool
        exists to amortize exactly this. Cache validity is by IDENTITY
        against the live stored table (holding the reference pins its id),
        so a refit or resolve_broadcast swap reconverts automatically."""
        tab = self._state()[name]
        cache = getattr(self, "_pd_cache", None)
        if cache is None:
            cache = self._pd_cache = {}
        hit = cache.get(name)
        if hit is not None and hit[0] is tab:
            return hit[1]
        df = tab.to_pandas()
        cache[name] = (tab, df)
        return df

    def prepare_broadcast(self):
        import ray

        self._pd_cache = {}  # never pickle the pandas copies to actors
        if not ray.is_initialized():
            return
        if not hasattr(self, "_refs"):
            self._refs = {}
        tables = self._state()
        for name, tab in list(tables.items()):
            if tab is not None and tab.nbytes > self._BROADCAST_BYTES:
                self._refs[name] = ray.put(tab)
                tables[name] = None

    def resolve_broadcast(self):
        import ray

        for name, ref in getattr(self, "_refs", {}).items():
            if self._state().get(name) is None:
                self._state()[name] = ray.get(ref)


class FitPlan:
    """One fuseable fit unit: ``partial`` maps a batch of the op's (already
    prepped) input columns to a small per-block partial table; the engine
    merges partials with ``combine_partial(keys, agg_spec)`` (all mergeable
    algebra, so merge order/partitioning can't change the result) and calls
    ``finalize`` once with the merged pandas frame to store state on the op.
    """

    __slots__ = ("partial", "keys", "agg_spec", "finalize")

    def __init__(self, partial, keys: list, agg_spec: dict, finalize):
        self.partial = partial
        self.keys = list(keys)
        self.agg_spec = dict(agg_spec)
        self.finalize = finalize


class StatOperator(Operator):
    """An operator with a distributed fit phase producing state."""

    def __init__(self):
        self.fitted = False

    def fit(self, col_selector: ColumnSelector, ds: Any) -> None:
        """Compute statistics over ``ds`` (a ray.data.Dataset of this op's
        input columns, upstream ops already applied) and store them on self."""
        raise NotImplementedError

    def fit_partials(self, col_selector: ColumnSelector, ds: Any):
        """Optional fusion protocol: return a list of :class:`FitPlan` when
        this op's fit is expressible as partial -> mergeable-reduce ->
        finalize (``ds`` is for schema inspection only), else None. When
        every ready stat op at a Workflow.fit level returns plans, the
        engine runs ONE input scan emitting all their partials instead of
        one scan per op — k stat fits for the price of one read."""
        return None

    def clear(self) -> None:
        self.fitted = False
