"""Sources & sinks (reference merlin.io surface, SURVEY.md §2.2)."""

from nvtabular_ray.sources.io import Shuffle, read_dataset, write_parquet

__all__ = ["Shuffle", "read_dataset", "write_parquet"]
