"""Resumable, lineage-tracked pipeline output (north-rule requirement:
"each partition emits lineage records and metrics so jobs resume from
checkpoint mid-shuffle").

Layout under ``out_dir``:

    part-{bucket:05d}.parquet          one file per hash bucket (atomic:
                                       written to .tmp then renamed)
    _lineage/part-{bucket:05d}.json    {rows_in, rows_out, wall_ms, bytes,
                                       op_chain_hash, bucket}
    _manifest.json                     {op_chain_hash, num_buckets,
                                       completed: [bucket, ...]}

A rerun with the same (workflow config, input, num_buckets) loads the
manifest and PRUNES completed buckets with a cheap map_batches filter BEFORE
the shuffle — only missing buckets are re-shuffled, re-transformed and
re-written, i.e. the job resumes mid-shuffle. A changed op-chain hash
invalidates the manifest (fresh run).

The reference has no analog — Dask rebuilds a failed fit/transform from
scratch (SURVEY.md §4 stragglers row); this layer is new scope.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nvtabular_ray.functions.hashing import hash64_columns
from nvtabular_ray.pipelines.partitioned import BUCKET_COL, _default_num_buckets


def _table_checksum(t: pa.Table) -> str:
    """Content checksum of a fitted table: schema + raw column buffer bytes.
    chunks are combined first so equal tables hash equal regardless of
    chunking; a refit that changes any value invalidates the manifest."""
    h = hashlib.sha256()
    h.update(str(t.schema).encode())
    for name in t.column_names:
        arr = t.column(name).combine_chunks()
        for buf in arr.buffers():
            if buf is not None:
                h.update(buf)
    return h.hexdigest()[:16]


def _op_chain_hash(workflow) -> str:
    """Stable hash of the DAG structure + op configs. Fitted pa.Tables hash
    by CONTENT (schema + buffers), not just shape: refitting on new data
    that happens to yield a same-cardinality stat table must still
    invalidate previously written buckets."""

    def describe(v):
        if isinstance(v, pa.Table):
            return ["table", v.num_rows, _table_checksum(v)]
        try:  # broadcast refs (prepare_broadcast nulls the table): hash content
            import ray

            if isinstance(v, ray.ObjectRef):
                obj = ray.get(v)
                return describe(obj)
        except ImportError:
            pass
        if isinstance(v, (list, tuple)):
            return [describe(x) for x in v]
        if isinstance(v, dict):
            return {str(k): describe(x) for k, x in sorted(v.items(), key=lambda kv: str(kv[0]))}
        if callable(v):
            return getattr(v, "__qualname__", repr(type(v)))
        return repr(v)

    parts = []
    transient = {"_ss_cache", "_refs", "_vocab_cache"}  # worker-local caches
    for node in workflow._nodes():
        if node.kind == "op":
            cfg = {k: v for k, v in node.op.__dict__.items() if k not in transient}
            parts.append([type(node.op).__name__, describe(cfg)])
        elif node.kind == "selection":
            parts.append(["select", node.selector.grouped_names])
        else:
            parts.append(["add", len(node.parents)])
    blob = json.dumps(parts, sort_keys=True, default=repr).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _load_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "_manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def resumable_transform(
    workflow,
    ds,
    out_dir: str,
    partition_cols: list[str],
    sort_cols: Optional[list[str]] = None,
    num_buckets: Optional[int] = None,
):
    """Run ``workflow.transform`` bucketed by ``partition_cols`` and write one
    parquet file + lineage record per bucket; skip buckets already completed
    by a previous run of the same workflow. Returns the manifest dict."""
    from nvtabular_ray.pipelines.partitioned import bucketed_group_map
    from nvtabular_ray.workflow import _FusedTransform

    num_buckets = num_buckets or _default_num_buckets()
    chain_hash = _op_chain_hash(workflow)
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    manifest = _load_manifest(out_dir)
    if manifest.get("op_chain_hash") != chain_hash or manifest.get("num_buckets") != num_buckets:
        manifest = {"op_chain_hash": chain_hash, "num_buckets": num_buckets, "completed": []}
    completed = set(manifest["completed"])

    spec = workflow._partitioned_spec()
    sort_keys = [
        c for c in (sort_cols or (list(spec[1]) if spec else [])) if c not in partition_cols
    ]

    root_cols = workflow.output_node.root_columns()
    avail = set(ds.schema(fetch_if_missing=True).names)
    ds = ds.select_columns([c for c in root_cols if c in avail])
    for n in workflow._op_nodes():
        pre = getattr(n.op, "pre_transform_stage", None)
        if pre is not None:
            workflow._check_distributed_root(n)
            ds = pre(ds)
    for n in workflow._op_nodes():
        n.op.prepare_broadcast()
    fn = _FusedTransform(workflow.output_node)
    op_nodes = workflow._op_nodes()

    def write_bucket(body: pa.Table, bucket: int) -> pa.Table:
        t0 = time.perf_counter()
        out = fn(body)
        fname = f"part-{bucket:05d}.parquet"
        tmp = os.path.join(out_dir, fname + ".tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(out_dir, fname))
        lineage = {
            "bucket": bucket,
            "file": fname,
            "rows_in": body.num_rows,
            "rows_out": out.num_rows,
            "bytes_in": body.nbytes,
            "bytes": out.nbytes,
            "null_cells_out": int(
                sum(out.column(c).null_count for c in out.column_names)
            ),
            "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
            "op_chain_hash": chain_hash,
        }
        # per-op counters (SURVEY §7.5: OOV rate etc.) via an optional hook
        for _n in op_nodes:
            hook = getattr(_n.op, "lineage_metrics", None)
            if hook is not None:
                try:
                    lineage.update(hook(out))
                except Exception:  # metrics must never fail the partition
                    pass
        with open(os.path.join(out_dir, "_lineage", f"part-{bucket:05d}.json"), "w") as f:
            json.dump(lineage, f)
        return pa.table({"bucket": pa.array([bucket], pa.int32()), "rows_out": pa.array([out.num_rows], pa.int64())})

    results = bucketed_group_map(
        ds,
        list(partition_cols),
        sort_keys,
        write_bucket,
        num_buckets=num_buckets,
        fn_accepts_bucket=True,
        skip_buckets=completed,
    ).take_all()
    manifest["completed"] = sorted(completed | {r["bucket"] for r in results})
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
