"""Operator namespace (mirrors ``nvtabular.ops``)."""

from nvtabular_ray.ops.base import Operator, StatOperator
from nvtabular_ray.ops.categorify import Categorify, get_embedding_sizes
from nvtabular_ray.ops.column_similarity import ColumnSimilarity
from nvtabular_ray.ops.context import ContextConcat
from nvtabular_ray.ops.data_stats import DataStats
from nvtabular_ray.ops.datepart import DatePart
from nvtabular_ray.ops.difference_lag import DifferenceLag
from nvtabular_ray.ops.ewma import Ewma
from nvtabular_ray.ops.last_where import LastWhere
from nvtabular_ray.ops.shift import Shift
from nvtabular_ray.ops.drop_low_cardinality import DropLowCardinality
from nvtabular_ray.ops.list_ops import ListSlice, ValueCount
from nvtabular_ray.ops.metadata import (
    AddMetadata,
    AddProperties,
    AddTags,
    TagAsItemFeatures,
    TagAsItemID,
    TagAsUserFeatures,
    TagAsUserID,
    Tags,
)
from nvtabular_ray.ops.dtypes import ReduceDtypeSize
from nvtabular_ray.ops.rank import GroupRank
from nvtabular_ray.ops.groupby import Groupby
from nvtabular_ray.ops.join_external import JoinExternal
from nvtabular_ray.ops.join_groupby import JoinGroupby
from nvtabular_ray.ops.target_encoding import TargetEncoding
from nvtabular_ray.ops.temporal_ops import ExpandingAgg, RollingAgg, Sessionize
from nvtabular_ray.ops.text_ops import PIIRedact, RepetitionRatio, TextClean, TokenCount
from nvtabular_ray.ops.fill import FillMedian, QuantileBucketize
from nvtabular_ray.ops.hashed import HashBucket, HashedCross
from nvtabular_ray.ops.normalize import Normalize, NormalizeMinMax, NormalizeRobust
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
    "PIIRedact",
    "RepetitionRatio",
    "TextClean",
    "TokenCount",
    "AddMetadata",
    "AddProperties",
    "AddTags",
    "Bucketize",
    "ColumnSimilarity",
    "DataStats",
    "DatePart",
    "DropLowCardinality",
    "ListSlice",
    "Tags",
    "TagAsItemFeatures",
    "TagAsItemID",
    "TagAsUserFeatures",
    "TagAsUserID",
    "ValueCount",
    "Categorify",
    "Clip",
    "ContextConcat",
    "GroupRank",
    "DifferenceLag",
    "Shift",
    "LastWhere",
    "Ewma",
    "Dropna",
    "Groupby",
    "JoinExternal",
    "JoinGroupby",
    "TargetEncoding",
    "FillMedian",
    "QuantileBucketize",
    "FillMissing",
    "Filter",
    "HashBucket",
    "HashedCross",
    "LambdaOp",
    "LogOp",
    "Normalize",
    "NormalizeRobust",
    "NormalizeMinMax",
    "ExpandingAgg",
    "RollingAgg",
    "Sessionize",
    "ReduceDtypeSize",
    "Rename",
    "get_embedding_sizes",
]
