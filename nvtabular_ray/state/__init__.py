"""Persistence: workflow save/load (JSON + parquet artifacts, no pickle),
per-partition lineage records, manifest-driven resumable runs."""

from nvtabular_ray.state.artifacts import load_workflow, save_workflow
from nvtabular_ray.state.resume import resumable_transform

__all__ = ["save_workflow", "load_workflow", "resumable_transform"]
