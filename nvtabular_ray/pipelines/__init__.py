"""Dataset-level building blocks: the bucketed key-partitioned shuffle runner,
as-of joins, sessionization, windowed features, and the flagship transcript
feature pipeline."""

from nvtabular_ray.pipelines.hot_split import ordered_features
from nvtabular_ray.pipelines.joins import shuffle_join, shuffle_join_chain
from nvtabular_ray.pipelines.partitioned import bucketed_group_map, shuffle_by_keys

__all__ = ["bucketed_group_map", "ordered_features", "shuffle_by_keys", "shuffle_join", "shuffle_join_chain"]
