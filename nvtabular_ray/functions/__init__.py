"""Vectorized helper kernels: stable hashing, distributed quantiles, sketches."""

from nvtabular_ray.functions.hashing import hash64, hash64_columns

__all__ = ["hash64", "hash64_columns"]
