"""Workflow save/load: JSON DAG + parquet artifacts, NO pickle.

Reference: workflow.save/load writes a JSON graph + parquet category
artifacts with version checks (/root/reference/nvtabular/workflow/
workflow.py:256-348, graph_serializer.py:16-29); lambdas are rejected —
only named importable callables serialize (graph_serializer.py:57-99).
Same rules here.

Layout:  path/graph.json  +  path/artifacts/{opIdx}.{attr}.parquet
"""

from __future__ import annotations

import importlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from nvtabular_ray.dag import Node
from nvtabular_ray.selector import ColumnSelector

_TRANSIENT = {
    "_refs",
    "_mat",
    "_resolved",
    "_ss_cache",
    "_vocab_cache",
    # per-batch pandas memo caches: runtime-only, not JSON/parquet state
    "_pd_cache",
    "_combo_pd_cache",
}

FORMAT_VERSION = 1


def _encode_value(v, art_dir, tag):
    if isinstance(v, pa.Table):
        fname = f"{tag}.parquet"
        pq.write_table(v, os.path.join(art_dir, fname))
        return {"__artifact__": fname}
    if isinstance(v, pa.DataType):
        return {"__patype__": str(v)}
    if isinstance(v, np.dtype):
        return {"__npdtype__": str(v)}
    if isinstance(v, (np.integer, np.floating)):
        return v.item()
    if isinstance(v, tuple):
        return {"__tuple__": [_encode_value(x, art_dir, f"{tag}.{i}") for i, x in enumerate(v)]}
    if isinstance(v, set):
        return {"__set__": sorted(_encode_value(x, art_dir, tag) for x in v)}
    if isinstance(v, dict):
        if all(isinstance(k, str) for k in v):
            return {k: _encode_value(x, art_dir, f"{tag}.{k}") for k, x in v.items()}
        return {
            "__tdict__": [
                [_encode_value(k, art_dir, tag), _encode_value(x, art_dir, f"{tag}.{i}")]
                for i, (k, x) in enumerate(v.items())
            ]
        }
    if isinstance(v, list):
        return [_encode_value(x, art_dir, f"{tag}.{i}") for i, x in enumerate(v)]
    if callable(v):
        mod = getattr(v, "__module__", None)
        qual = getattr(v, "__qualname__", "")
        if not mod or "<lambda>" in qual or "<locals>" in qual:
            raise ValueError(
                f"cannot serialize callable {v!r}: only named module-level functions "
                "are saveable (reference graph_serializer rule)"
            )
        return {"__callable__": f"{mod}:{qual}"}
    json.dumps(v)  # raises for anything exotic
    return v


def _decode_value(v, art_dir):
    if isinstance(v, dict):
        if "__artifact__" in v:
            return pq.read_table(os.path.join(art_dir, v["__artifact__"]))
        if "__patype__" in v:
            return pa.type_for_alias(v["__patype__"]) if "[" not in v["__patype__"] else _parse_patype(v["__patype__"])
        if "__npdtype__" in v:
            return np.dtype(v["__npdtype__"])
        if "__tuple__" in v:
            return tuple(_decode_value(x, art_dir) for x in v["__tuple__"])
        if "__set__" in v:
            return set(_decode_value(x, art_dir) for x in v["__set__"])
        if "__tdict__" in v:
            return {
                _decode_value(k, art_dir): _decode_value(x, art_dir) for k, x in v["__tdict__"]
            }
        if "__callable__" in v:
            mod, qual = v["__callable__"].split(":")
            obj = importlib.import_module(mod)
            for part in qual.split("."):
                obj = getattr(obj, part)
            return obj
        return {k: _decode_value(x, art_dir) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode_value(x, art_dir) for x in v]
    return v


def _parse_patype(s: str) -> pa.DataType:
    if s.startswith("timestamp"):
        unit = s[s.index("[") + 1 : s.index("]")]
        return pa.timestamp(unit)
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = s[s.index("<") + 1 : s.rindex(">")]
        if ":" in inner:
            inner = inner.split(":", 1)[1].strip()
        vt = pa.type_for_alias(inner) if "[" not in inner else _parse_patype(inner)
        return pa.large_list(vt) if s.startswith("large_list") else pa.list_(vt)
    return pa.type_for_alias(s)


def save_workflow(workflow, path: str) -> None:
    art_dir = os.path.join(path, "artifacts")
    os.makedirs(art_dir, exist_ok=True)
    nodes = workflow._nodes()
    idx = {id(n): i for i, n in enumerate(nodes)}
    out = []
    for i, n in enumerate(nodes):
        entry = {"kind": n.kind, "parents": [idx[id(p)] for p in n.parents]}
        if n.selector is not None:
            entry["selector"] = [
                list(g) if isinstance(g, tuple) else g for g in n.selector.grouped_names
            ]
        if n.op is not None:
            # a transform over a Ray Dataset swaps >1MiB fitted tables for
            # ObjectRefs (prepare_broadcast: table slot -> None, ref in the
            # transient _refs) — restore them first or the save silently
            # persists None where the vocab/stat table was
            resolve = getattr(n.op, "resolve_broadcast", None)
            if callable(resolve):
                resolve()
            cls = type(n.op)
            config = {
                k: _encode_value(v, art_dir, f"{i}.{k}")
                for k, v in n.op.__dict__.items()
                if k not in _TRANSIENT
            }
            entry["op"] = {"class": f"{cls.__module__}:{cls.__qualname__}", "config": config}
        out.append(entry)
    graph = {
        "format_version": FORMAT_VERSION,
        "engine": "nvtabular_ray",
        "nodes": out,
        "output": idx[id(workflow.output_node)],
    }
    with open(os.path.join(path, "graph.json"), "w") as f:
        json.dump(graph, f, indent=1)


def load_workflow(path: str):
    from nvtabular_ray.workflow import Workflow

    art_dir = os.path.join(path, "artifacts")
    with open(os.path.join(path, "graph.json")) as f:
        graph = json.load(f)
    if graph.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"unsupported workflow format {graph.get('format_version')}")
    nodes: list[Node] = []
    for entry in graph["nodes"]:
        parents = [nodes[p] for p in entry["parents"]]
        selector = ColumnSelector(entry["selector"]) if "selector" in entry else None
        op = None
        if "op" in entry:
            mod, qual = entry["op"]["class"].split(":")
            cls = importlib.import_module(mod)
            for part in qual.split("."):
                cls = getattr(cls, part)
            op = cls.__new__(cls)
            op.__dict__.update(
                {k: _decode_value(v, art_dir) for k, v in entry["op"]["config"].items()}
            )
            op._refs = {}
        nodes.append(Node(selector=selector, op=op, parents=parents, kind=entry["kind"]))
    return Workflow(nodes[graph["output"]])
