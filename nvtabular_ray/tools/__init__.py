"""Dataset tooling: look-alike synthetic data generation from DataStats
profiles (reference nvtabular/tools/data_gen.py analog)."""

from nvtabular_ray.tools.data_gen import DatasetGen

__all__ = ["DatasetGen"]
