"""nvtabular_ray — a from-scratch Ray-Data-native feature-engineering engine.

Re-expresses the fit/transform workflow semantics of NVIDIA-Merlin/NVTabular
(reference at /root/reference, cited per-op in docstrings) as idiomatic
Ray Data: ``ray.data.Dataset`` pipelines of ``map_batches`` stages over
zero-copy Arrow batches, actor pools for stateful stages, and explicit
``groupby``/``sort`` shuffles for the wide steps.

This is NOT a port: the reference executes on Dask(-cuDF); everything here is
built on the public Ray Data + pyarrow APIs.
"""

from nvtabular_ray.selector import ColumnSelector
from nvtabular_ray.dag import Node
from nvtabular_ray.workflow import Workflow
from nvtabular_ray import ops
from nvtabular_ray.loader import TrainLoader

__version__ = "0.1.0"

__all__ = ["ColumnSelector", "Node", "Workflow", "ops", "TrainLoader"]
