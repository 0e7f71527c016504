"""Operator namespace (mirrors ``nvtabular.ops``)."""

from nvtabular_ray.ops.base import Operator, StatOperator
from nvtabular_ray.ops.categorify import Categorify, get_embedding_sizes
from nvtabular_ray.ops.dtypes import ReduceDtypeSize
from nvtabular_ray.ops.fill import FillMedian
from nvtabular_ray.ops.hashed import HashBucket, HashedCross
from nvtabular_ray.ops.normalize import Normalize, NormalizeMinMax
from nvtabular_ray.ops.simple import (
    Bucketize,
    Clip,
    Dropna,
    FillMissing,
    Filter,
    LambdaOp,
    LogOp,
    Rename,
)

__all__ = [
    "Operator",
    "StatOperator",
    "Bucketize",
    "Categorify",
    "Clip",
    "Dropna",
    "FillMedian",
    "FillMissing",
    "Filter",
    "HashBucket",
    "HashedCross",
    "LambdaOp",
    "LogOp",
    "Normalize",
    "NormalizeMinMax",
    "ReduceDtypeSize",
    "Rename",
    "get_embedding_sizes",
]
