"""Workflow: sklearn-style fit/transform over an operator DAG, compiled to
Ray Data stages.

Reference lifecycle (/root/reference/nvtabular/workflow/workflow.py:45-74,
195-248): fit walks the DAG topologically, computing statistics for each
StatOperator over the *upstream-transformed* data; transform lazily maps the
whole fused DAG over each partition. Here:

- fit         = per-stat-op Ray Data jobs (map_batches partials + groupby
                shuffles) over a lazily upstream-transformed Dataset.
- transform   = ONE fused stage over the input Dataset:
    * all ops per-batch            -> ds.map_batches(fused_fn) — stateless
      tasks, or an actor pool when any op carries heavy fitted state
      (vocabularies etc.; the actor loads state once per worker, the Ray
      analog of the reference's per-worker cat_cache,
      categorify.py:1627-1643);
    * any op needs entity-complete ordered input (partition_cols set:
      DifferenceLag, sessionize, windows) -> the same fused DAG runs inside
      a bucketed groupby().map_groups shuffle (pipelines/partitioned.py) so
      every entity's rows arrive contiguous and sorted — no reference-style
      "pre-shuffle it yourself" footgun;
    * a terminal dataset-level op (Groupby) runs as its own Ray Data stage.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from nvtabular_ray.arrow_utils import dataset_arrow_schema, hstack
from nvtabular_ray.dag import Node
from nvtabular_ray.ops.base import Operator, StatOperator
from nvtabular_ray.selector import ColumnSelector


def _eval_dag(root_table: pa.Table, output_node: Node) -> pa.Table:
    """Evaluate the whole DAG on one Arrow batch; returns the output columns."""
    cache: dict[int, pa.Table] = {}

    def ev(node: Node) -> pa.Table:
        key = id(node)
        if key in cache:
            return cache[key]
        if node.kind == "selection":
            src = ev(node.parents[0]) if node.parents else root_table
            out = src.select(node.selector.names)
        elif node.kind == "addition":
            out = hstack([ev(p) for p in node.parents])
        else:  # op
            parent_tables = [ev(p) for p in node.parents]
            inp = hstack(parent_tables)
            deps = [c for c in node.op.dependencies if c not in inp.column_names]
            # optional deps (e.g. TargetEncoding's target at serving time)
            # may be absent: the op switches behavior on column presence
            optional = set(getattr(node.op, "optional_dependencies", []) or [])
            deps = [
                c for c in deps if c in root_table.column_names or c not in optional
            ]
            if deps:
                dep_tab = root_table.select(deps)
                if dep_tab.num_rows != inp.num_rows:
                    raise ValueError(
                        f"op {node.op.label} dependencies {deps} cannot be row-aligned "
                        "after a row-count-changing upstream op"
                    )
                inp = hstack([inp, dep_tab])
            out = node.op.transform(node.input_selector, inp)
        cache[key] = out
        return out

    return ev(output_node)


class _FusedTransform:
    """The fused per-batch DAG function; also usable as an actor-pool class.

    As an actor, ``__init__`` resolves broadcast state (ray.get of vocab/stat
    ObjectRefs) once per actor — work is amortized across all batches the
    actor processes. When ``expected_schema`` is given, the FIRST batch's
    output dtypes are validated against it (reference fail-fast dtype check,
    workflow.py:125-139) — a mis-declared op raises with the column named
    instead of surfacing as a parquet-write surprise.
    """

    def __init__(self, output_node: Node, expected_schema: Optional[dict] = None):
        self.output_node = output_node
        self.expected_schema = expected_schema
        self._resolved = False
        self._validated = False

    def _resolve(self):
        # Runs on the WORKER (first batch of a task fn / actor): ray.get of
        # broadcast refs is object-store-local and zero-copy for Arrow data.
        for node in self.output_node.topo_order():
            if node.kind == "op":
                node.op.resolve_broadcast()
        self._resolved = True

    def _validate_schema(self, out: pa.Table):
        for name, expect in self.expected_schema.items():
            if expect is None or name not in out.column_names:
                continue
            actual = out.schema.field(name).type
            if actual != expect:
                raise RuntimeError(
                    f"schema mismatch for output column '{name}': the DAG "
                    f"declares {expect} but the transform produced {actual} "
                    "(an op's compute_output_schema disagrees with its "
                    "transform)"
                )
        self._validated = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._resolved:
            self._resolve()
        out = _eval_dag(batch, self.output_node)
        if self.expected_schema is not None and not self._validated and out.num_rows:
            self._validate_schema(out)
        return out


class Workflow:
    def __init__(self, output_node, artifact_path: Optional[str] = None):
        if not isinstance(output_node, Node):
            output_node = Node.from_selection(output_node)
        self.output_node = output_node
        self.artifact_path = artifact_path
        self._validate()

    # ------------------------------------------------------------------ #
    def _nodes(self) -> list[Node]:
        return self.output_node.topo_order()

    def _op_nodes(self) -> list[Node]:
        return [n for n in self._nodes() if n.kind == "op"]

    def _partitioned_spec(self):
        """(partition_cols, sort_cols) shared by all partitioned ops, or None."""
        spec = None
        for n in self._op_nodes():
            if n.op.partition_cols:
                s = (tuple(n.op.partition_cols), tuple(n.op.sort_cols or ()))
                if spec is None:
                    spec = s
                elif spec[0] != s[0]:
                    raise ValueError(
                        f"all partitioned ops in one workflow must share partition_cols; "
                        f"got {spec[0]} and {s[0]}"
                    )
                else:
                    # union of sort columns, first spec order wins
                    extra = [c for c in s[1] if c not in spec[1]]
                    spec = (spec[0], spec[1] + tuple(extra))
        return spec

    def _terminal_dataset_op(self) -> Optional[Node]:
        ds_nodes = [n for n in self._op_nodes() if n.op.is_dataset_level]
        if not ds_nodes:
            return None
        if len(ds_nodes) > 1 or ds_nodes[0] is not self.output_node:
            raise ValueError(
                "dataset-level ops (Groupby) must be the single terminal node of the DAG"
            )
        return ds_nodes[0]

    def _validate(self):
        self._partitioned_spec()
        self._terminal_dataset_op()

    @staticmethod
    def _check_distributed_root(node: Node) -> None:
        """Distributed-state ops (Categorify/JoinGroupby/TargetEncoding with
        distributed=True) resolve their shuffle join against ROOT column
        values. If the op's input is not a direct root selection, fit saw
        upstream-TRANSFORMED values while the join would see RAW ones —
        silently wrong output (e.g. LambdaOp(upper) >> Categorify(distributed)
        encodes everything OOV). Fail loudly instead."""
        if getattr(node.op, "pre_transform_stage", None) is None:
            return
        if not getattr(node.op, "distributed", False):
            return  # broadcast-state path re-evaluates upstream per batch: safe
        if all(p.kind == "selection" and not p.parents for p in node.parents):
            return
        raise NotImplementedError(
            f"distributed-state op {node.op.label} must consume a direct root "
            "column selection: its shuffle join resolves against raw input "
            "values, which diverge from upstream-transformed values. Apply "
            "upstream ops in a separate workflow (materialize, then fit this "
            "op on the result), or use the non-distributed path."
        )

    # ------------------------------------------------------------- fit -- #
    def fit(self, ds, overlap_fits: bool = False) -> "Workflow":
        """Fit every StatOperator, level-ordered.

        Each stat op sees its input columns with all upstream ops already
        applied (chained-workflow semantics, reference
        tests/unit/workflow/test_workflow_chaining.py). Independent stat
        fits run serially by default (measured faster at every cluster size
        once reads are pruned — see the comment below); ``overlap_fits=True``
        launches them concurrently from driver threads instead."""
        from concurrent.futures import ThreadPoolExecutor

        def stat_ancestors(node: Node) -> list[Node]:
            out = []
            for p in node.parents:
                for anc in p.topo_order():
                    if anc.kind == "op" and isinstance(anc.op, StatOperator):
                        out.append(anc)
            return out

        pending = [
            n
            for n in self._nodes()
            if n.kind == "op" and isinstance(n.op, StatOperator) and not n.op.fitted
        ]
        while pending:
            ready = [
                n
                for n in pending
                if all(a.op.fitted for a in stat_ancestors(n) if a is not n)
            ]
            if not ready:
                raise RuntimeError("cyclic stat dependencies")

            def fit_one(node: Node):
                upstream = self._upstream_dataset(ds, node)
                node.op.fit(node.input_selector, upstream)
                node.op.fitted = True

            # Ready fits run SERIALLY (third flip of this dial, each time
            # measured): thread-overlap won when every fit paid a full-width
            # input decode (12.7s -> 7.5s at 8 cpus), because overlap hid
            # the scan latency. After parquet-read pruning (pruned_projection
            # — fits no longer decode the wide text column) and the
            # direct-ref grouped_reduce (no extra stage boundaries), each
            # fit is a short well-parallelized job and concurrent Ray Data
            # executors only contend: serial beats overlap at EVERY cluster
            # size (2 cpus: 20.8 vs 24.7 s; 8: 6.7 vs 8.0; 32: 2.9 vs 3.3
            # on the 37M/12M-turn flagship fit). ``overlap_fits=True``
            # restores the old behavior for fits that are scan-bound again
            # (e.g. many stat ops over columns too wide to prune).
            # FUSED fit: ops exposing fit_partials (Categorify broadcast,
            # TargetEncoding broadcast, Normalize/NormalizeMinMax) share ONE
            # input scan — a single map_batches emits every plan's per-block
            # partial (tagged pickled tables, a few KB each) and a tag-aware
            # fan-in tree merges them. k stat fits for one read: the
            # flagship's 3-fit phase is one pass instead of three.
            planned, rest = [], []
            for node in ready:
                info = self._upstream_prep(ds, node)
                plans = None
                if info is not None:
                    plans = node.op.fit_partials(
                        node.input_selector, self._upstream_dataset(ds, node)
                    )
                if plans:
                    planned.append((node, plans, info))
                else:
                    rest.append(node)
            if sum(len(p) for _, p, _ in planned) >= 2:
                self._run_fused_fits(ds, planned)
            else:
                rest = [n for n, _, _ in planned] + rest

            if len(rest) == 1 or not overlap_fits:
                for node in rest:
                    fit_one(node)
            elif rest:
                with ThreadPoolExecutor(max_workers=min(8, len(rest))) as ex:
                    list(ex.map(fit_one, rest))
            pending = [n for n in pending if not n.op.fitted]
        return self

    def _run_fused_fits(self, ds, planned):
        """Execute many FitPlans over ONE scan of the union of their input
        columns; per-node prep (projection or upstream-op evaluation) runs
        inside the same task before each plan's partial."""
        import pickle

        import pandas as pd

        from nvtabular_ray.arrow_utils import pruned_projection
        from nvtabular_ray.functions.aggregates import fused_grouped_reduce

        specs, entries = [], []
        union_cols: list[str] = []
        for _node, plans, (cols, prep) in planned:
            for c in cols:
                if c not in union_cols:
                    union_cols.append(c)
            for plan in plans:
                specs.append((plan.keys, plan.agg_spec))
                entries.append((prep, plan.partial))

        def multi_partial(t: pa.Table) -> pa.Table:
            tags, blobs = [], []
            for i, (prep, part) in enumerate(entries):
                tags.append(i)
                blobs.append(pickle.dumps(part(prep(t))))
            return pa.table(
                {"tag": pa.array(tags, pa.int64()), "blob": pa.array(blobs, pa.binary())}
            )

        blob_ds = pruned_projection(ds, union_cols).map_batches(
            multi_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        # 4 GiB driver guard: fused partials span every rider op's key
        # space; checked from object-store metadata before the final get
        merged = fused_grouped_reduce(blob_ds, specs, memory_limit=4 << 30)
        i = 0
        for node, plans, _info in planned:
            for plan in plans:
                df = merged[i]
                i += 1
                if df is None:  # zero-block input: finalize on an empty frame
                    df = pd.DataFrame(columns=plan.keys + list(plan.agg_spec))
                plan.finalize(df)
            node.op.fitted = True

    def _upstream_prep(self, ds, node: Node):
        """(root_cols, prep(Table)->Table) for running ``node``'s stat
        partial inside a shared scan, or None when the node's upstream needs
        a pre_transform_stage shuffle (distributed-state ancestors) and
        cannot ride a plain fused pass. ``prep`` accepts a SUPERSET batch
        (the fused scan projects the union of all planned nodes' columns)."""
        parents = node.parents
        for p in parents:
            for anc in p.topo_order():
                if anc.kind == "op" and getattr(anc.op, "pre_transform_stage", None) is not None:
                    return None
        sel_cols = list(node.input_selector.names) + [
            c for c in node.op.dependencies if c not in node.input_selector.names
        ]
        needed_roots = set()
        for p in parents:
            needed_roots.update(p.root_columns())
        needed_roots.update(node.op.dependencies)
        root_cols = [c for c in _existing_columns(ds) if c in needed_roots]

        if all(p.kind == "selection" and not p.parents for p in parents):
            return sel_cols, lambda t: t.select(sel_cols)

        def partial_eval(batch: pa.Table) -> pa.Table:
            parts = [_eval_dag(batch, p) for p in parents]
            inp = hstack(parts)
            deps = [c for c in node.op.dependencies if c not in inp.column_names]
            if deps:
                inp = hstack([inp, batch.select(deps)])
            return inp.select(sel_cols)

        return root_cols, partial_eval

    def _upstream_dataset(self, ds, node: Node):
        """Lazy Dataset holding ``node``'s input columns (+deps)."""
        parents = node.parents
        # chained stat after a distributed-state op: resolve its shuffle-join
        # first so the ancestor's transform finds its synthetic deps
        seen: set[int] = set()
        for p in parents:
            for anc in p.topo_order():
                if anc.kind == "op" and id(anc.op) not in seen:
                    seen.add(id(anc.op))
                    pre = getattr(anc.op, "pre_transform_stage", None)
                    if pre is not None:
                        self._check_distributed_root(anc)
                        ds = pre(ds)
        sel_cols = list(node.input_selector.names) + [
            c for c in node.op.dependencies if c not in node.input_selector.names
        ]
        # root columns the partial DAG needs
        needed_roots = set()
        for p in parents:
            needed_roots.update(p.root_columns())
        needed_roots.update(node.op.dependencies)
        root_cols = [c for c in _existing_columns(ds) if c in needed_roots]

        from nvtabular_ray.arrow_utils import pruned_projection

        if all(p.kind == "selection" and not p.parents for p in parents):
            # stat op directly over root columns: just project (pruning the
            # parquet read itself — see pruned_projection)
            return pruned_projection(ds, sel_cols)

        def partial_eval(batch: pa.Table) -> pa.Table:
            parts = [_eval_dag(batch, p) for p in parents]
            inp = hstack(parts)
            deps = [c for c in node.op.dependencies if c not in inp.column_names]
            if deps:
                inp = hstack([inp, batch.select(deps)])
            return inp.select(sel_cols)

        return pruned_projection(ds, root_cols).map_batches(
            partial_eval, batch_format="pyarrow", zero_copy_batch=True
        )

    # ------------------------------------------------------- transform -- #
    def transform(self, ds, num_buckets: Optional[int] = None, concurrency=None):
        """Compile + launch the (lazy) transform pipeline; returns a Dataset.

        Dispatches on input type (reference workflow.py:77-122): a pandas
        DataFrame or pa.Table runs in-process via ``transform_batch`` and
        returns the same type; a Ray Dataset runs the distributed pipeline.
        """
        import pandas as _pd

        if isinstance(ds, _pd.DataFrame):
            return self.transform_batch(ds).to_pandas()
        if isinstance(ds, pa.Table):
            return self.transform_batch(ds)
        for n in self._op_nodes():
            op = n.op
            if isinstance(op, StatOperator) and not op.fitted:
                raise RuntimeError(f"workflow not fitted: {op.label}; call fit() first")

        terminal = self._terminal_dataset_op()
        if terminal:
            body_output = terminal.parents[0]
            dep_cols = [
                c for c in terminal.op.dependencies if c not in body_output.output_columns
            ]
            if dep_cols:
                body_output = body_output + Node.from_selection(dep_cols)
        else:
            body_output = self.output_node

        spec = self._partitioned_spec()
        root_cols = self.output_node.root_columns()
        avail = _existing_columns(ds)
        # __catcode_* / __jgb_* deps are synthetic: produced by the
        # pre_transform_stage shuffles below, never expected in the input
        optional = set()
        for n in self._op_nodes():
            optional.update(getattr(n.op, "optional_dependencies", []) or [])
        missing = [
            c
            for c in root_cols
            if c not in avail
            and c not in optional
            and not c.startswith(("__catcode_", "__jgb_", "__te_"))
        ]
        if missing:
            raise ValueError(f"input dataset missing columns {missing}")
        from nvtabular_ray.arrow_utils import pruned_projection

        ds = pruned_projection(ds, [c for c in root_cols if c in avail])

        # distributed-state ops (Categorify vocab, JoinGroupby stats too big
        # to broadcast): resolve via a shuffle join BEFORE the fused stage;
        # results ride along as synthetic dependency columns
        for n in self._op_nodes():
            pre = getattr(n.op, "pre_transform_stage", None)
            if pre is not None:
                self._check_distributed_root(n)
                ds = pre(ds)

        for n in self._op_nodes():
            n.op.prepare_broadcast()

        needs_actor = any(n.op.needs_actor for n in self._op_nodes())

        # compile-time dtype propagation; the fused fn validates batch 1
        try:
            expected = self.output_schema(ds, node=body_output)
        except Exception:
            expected = None

        if spec is not None:
            from nvtabular_ray.pipelines.partitioned import bucketed_group_map

            partition_cols, sort_cols = list(spec[0]), list(spec[1])
            out = bucketed_group_map(
                ds,
                partition_cols,
                sort_cols,
                _FusedTransform(_detached(body_output), expected),
                num_buckets=num_buckets,
            )
        else:
            kwargs = dict(batch_format="pyarrow", batch_size=None)
            if needs_actor:
                # autoscaling pool (1, N): a FIXED pool of N reserves N CPUs
                # up front and can deadlock the upstream read stage on a
                # small cluster; (1, N) starts with one actor and grows only
                # while CPUs are free
                if isinstance(concurrency, tuple):
                    conc = concurrency
                elif concurrency:
                    conc = (1, concurrency)
                else:
                    # default pool ceiling = cluster CPUs: a constant would
                    # cap the engine's ONLY compute stage at that many cores
                    # no matter how many nodes the cluster has
                    import ray as _ray

                    try:
                        ncpu = int(_ray.cluster_resources().get("CPU", 4))
                    except Exception:
                        ncpu = 4
                    conc = (1, max(4, ncpu))
                out = ds.map_batches(
                    _FusedTransform,
                    fn_constructor_args=(_detached(body_output), expected),
                    concurrency=conc,
                    **kwargs,
                )
            else:
                fn = _FusedTransform(_detached(body_output), expected)
                out = ds.map_batches(fn, zero_copy_batch=True, **kwargs)

        if terminal is not None:
            out = terminal.op.apply_dataset(
                ColumnSelector(body_output.output_columns), out
            )
        return out

    def fit_transform(self, ds, **kw):
        return self.fit(ds).transform(ds, **kw)

    # ---------------------------------------------------------- schema -- #
    def output_schema(self, input_schema, node: Optional[Node] = None) -> dict:
        """Fold per-op ``compute_output_schema`` declarations through the DAG:
        output column -> pa.DataType (None where an op declares its output
        input-dependent). ``input_schema`` is a {col: pa.DataType} dict, a
        pa.Schema, or a Dataset. The fused transform validates its first
        produced batch against this (reference dtype propagation + fail-fast,
        workflow.py:125-139)."""
        if hasattr(input_schema, "schema"):  # Dataset
            s = dataset_arrow_schema(input_schema)
            root = dict(zip(s.names, s.types))
        elif isinstance(input_schema, pa.Schema):
            root = {f.name: f.type for f in input_schema}
        else:
            root = dict(input_schema)
        memo: dict[int, dict] = {}

        def ev(n: Node) -> dict:
            if id(n) in memo:
                return memo[id(n)]
            if n.kind == "selection":
                src = ev(n.parents[0]) if n.parents else root
                out = {c: src.get(c) for c in n.selector.names}
            elif n.kind == "addition":
                out = {}
                for p in n.parents:
                    out.update(ev(p))
            else:
                inp: dict = {}
                for p in n.parents:
                    inp.update(ev(p))
                for d in n.op.dependencies:
                    if d not in inp and d in root:
                        inp[d] = root[d]
                out = n.op.compute_output_schema(n.input_selector, inp)
            memo[id(n)] = out
            return out

        return ev(node or self.output_node)

    # ----------------------------------------------------- serving path -- #
    def transform_batch(self, table) -> pa.Table:
        """In-process single-batch transform (the serving/inference path —
        reference LocalExecutor, workflow.py:250-254): fit on a Dataset once,
        then transform one pa.Table (or pandas DataFrame) with no Ray stage.
        Output equals the Dataset path row-for-row for batch-local DAGs;
        ordered (partitioned) ops are applied after an in-memory sort, so the
        batch must contain each entity's full history for exact lag/window
        values."""
        if not isinstance(table, pa.Table):
            table = pa.Table.from_pandas(table, preserve_index=False)
        for n in self._op_nodes():
            op = n.op
            if isinstance(op, StatOperator) and not op.fitted:
                raise RuntimeError(f"workflow not fitted: {op.label}; call fit() first")
            if getattr(op, "distributed", False):
                raise NotImplementedError(
                    f"{op.label}(distributed=True) resolves state via a shuffle "
                    "join and cannot serve single batches; fit with "
                    "distributed=False for the serving path"
                )
            op.resolve_broadcast()
        spec = self._partitioned_spec()
        if spec is not None:
            sort_keys = list(spec[0]) + [c for c in spec[1] if c not in spec[0]]
            table = table.sort_by([(k, "ascending") for k in sort_keys])
        terminal = self._terminal_dataset_op()
        if terminal is not None:
            # reference LocalExecutor runs dataset-level terminal ops on the
            # single batch (workflow.py:250-254): evaluate the body DAG, then
            # the partition-local aggregate — exact when the batch holds each
            # key's complete rows (same contract as the ordered ops above)
            body_output = terminal.parents[0]
            dep_cols = [
                c for c in terminal.op.dependencies if c not in body_output.output_columns
            ]
            if dep_cols:
                body_output = body_output + Node.from_selection(dep_cols)
            body = _eval_dag(table, body_output)
            return terminal.op.apply_batch(
                ColumnSelector(body_output.output_columns), body
            )
        return _eval_dag(table, self.output_node)

    # ------------------------------------------------------- subgraphs -- #
    def get_subworkflow(self, name: str) -> "Workflow":
        """Extract the subgraph ``Node.alias(name)``-ed at build time as a
        standalone Workflow SHARING the fitted op instances — fit once, serve
        a branch (e.g. only the categorical tower) independently. Reference:
        get_subworkflow, workflow.py:168-170."""
        matches = [n for n in self._nodes() if getattr(n, "name", None) == name]
        if not matches:
            available = sorted(
                n.name for n in self._nodes() if getattr(n, "name", None)
            )
            raise KeyError(f"no subgraph named {name!r}; available: {available}")
        if len(matches) > 1:
            raise KeyError(f"subgraph name {name!r} is ambiguous ({len(matches)} nodes)")
        return Workflow(matches[0])

    def remove_inputs(self, input_cols) -> "Workflow":
        """New Workflow with the given ROOT input columns removed (reference
        workflow.py:172-193) — the serving story: strip the training-only
        columns (e.g. the label) and transform inference traffic. Root
        selections lose the columns; branches that become empty are pruned;
        fitted op state is SHARED with this workflow (ops whose removed
        column was a declared-optional dependency, like TargetEncoding's
        target, switch to their serving behavior)."""
        drop = {input_cols} if isinstance(input_cols, str) else set(input_cols)
        memo: dict[int, Optional[Node]] = {}

        def clone(node: Node) -> Optional[Node]:
            if id(node) in memo:
                return memo[id(node)]
            parents = [p2 for p in node.parents if (p2 := clone(p)) is not None]
            new: Optional[Node]
            if node.kind == "selection" and not node.parents:
                keep = [
                    g
                    for g in node.selector.grouped_names
                    if not (set([g] if isinstance(g, str) else list(g)) & drop)
                ]
                new = Node(selector=ColumnSelector(keep), kind="selection") if keep else None
            elif node.kind == "selection":
                new = (
                    Node(selector=node.selector, parents=parents, kind="selection")
                    if parents
                    else None
                )
            elif node.kind == "addition":
                if not parents:
                    new = None
                elif len(parents) == 1:
                    new = parents[0]
                else:
                    new = Node(parents=parents, kind="addition")
            else:  # op — share the fitted instance
                new = Node(op=node.op, parents=parents, kind="op") if parents else None
            if new is not None and new is not node:
                # when an addition collapses to its single surviving parent,
                # don't clobber that parent clone's own subgraph alias with
                # this node's (usually-None) name — get_subworkflow on the
                # pruned workflow would lose the named branch
                if node.name is not None and new.name is None:
                    new.name = node.name
            memo[id(node)] = new
            return new

        root = clone(self.output_node)
        if root is None:
            raise ValueError(f"removing {sorted(drop)} leaves an empty workflow")
        return Workflow(root, artifact_path=self.artifact_path)

    # ------------------------------------------------ schema properties --
    def fit_schema(self, input_schema: dict) -> "Workflow":
        """Metadata-only schema pass (reference workflow.py:125-139): record
        the input schema and propagate dtypes to every node; no data read.
        ``input_schema``: {column: pa.DataType}."""
        self._input_schema = dict(input_schema)
        self._fitted_output_schema = self.output_schema(self._input_schema)
        return self

    @property
    def input_schema(self) -> dict:
        """{column: pa.DataType} of the root columns this DAG consumes
        (available after fit_schema; reference workflow.py:150-152)."""
        if getattr(self, "_input_schema", None) is None:
            raise RuntimeError("call fit_schema(input_schema) or fit() first")
        need = set(self.output_node.root_columns())
        return {c: t for c, t in self._input_schema.items() if c in need}

    @property
    def input_dtypes(self) -> dict:
        return self.input_schema

    @property
    def output_dtypes(self) -> dict:
        if getattr(self, "_fitted_output_schema", None) is None:
            raise RuntimeError("call fit_schema(input_schema) or fit() first")
        return dict(self._fitted_output_schema)

    def output_columns(self) -> list[str]:
        return self.output_node.output_columns

    def output_metadata(self) -> dict[str, dict]:
        """Per-output-column tags + properties, propagated through the DAG —
        the light-weight analog of the reference's schema system
        (SURVEY.md §1.4: tags CATEGORICAL/CONTINUOUS/..., properties like
        value_count; reference add_metadata.py:54-72, value_counts.py:60-75).
        """
        meta: dict[str, dict] = {}

        def ensure(col):
            return meta.setdefault(col, {"tags": set(), "properties": {}})

        for node in self._nodes():
            if node.kind != "op":
                continue
            out_cols = node.op.output_column_names(node.input_selector)
            tags = getattr(node.op, "output_tags", None)
            props_fn = getattr(node.op, "output_properties", None)
            props = props_fn() if callable(props_fn) else {}
            for col in out_cols:
                entry = ensure(col)
                if tags:
                    entry["tags"].update(tags if not callable(tags) else [])
                if props:
                    # per-column properties (dict of col->dict) or shared dict
                    if col in props and isinstance(props[col], dict):
                        entry["properties"].update(props[col])
                    elif not any(isinstance(v, dict) for v in props.values()):
                        entry["properties"].update(props)
        for col in self.output_columns():
            ensure(col)
        return {c: {"tags": sorted(v["tags"]), "properties": v["properties"]} for c, v in meta.items()}

    def clear_stats(self):
        for n in self._op_nodes():
            if isinstance(n.op, StatOperator):
                n.op.clear()

    # ------------------------------------------------------- persistence -- #
    def save(self, path: str) -> None:
        """JSON DAG + parquet artifacts; no pickle (reference
        workflow.py:256-297 layout)."""
        from nvtabular_ray.state.artifacts import save_workflow

        save_workflow(self, path)

    @classmethod
    def load(cls, path: str) -> "Workflow":
        from nvtabular_ray.state.artifacts import load_workflow

        return load_workflow(path)

    def transform_resumable(self, ds, out_dir: str, partition_cols, **kw):
        """Partitioned transform with per-bucket lineage + manifest resume
        (state/resume.py)."""
        from nvtabular_ray.state.resume import resumable_transform

        return resumable_transform(self, ds, out_dir, partition_cols, **kw)


def _detached(node: Node) -> Node:
    """The DAG object shipped to workers (it is already plain-python)."""
    return node


def _existing_columns(ds) -> list[str]:
    schema = dataset_arrow_schema(ds)
    return list(schema.names)
