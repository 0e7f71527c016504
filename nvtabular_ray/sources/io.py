"""Dataset readers and the shuffling parquet writer.

Reference surface (SURVEY.md §2.2):
- ``Dataset(paths, engine="parquet"/"csv", part_size=...)`` multi-file reader
  (tests/conftest.py:238-242) -> ``read_dataset``.
- ``to_parquet(path, shuffle=Shuffle.PER_PARTITION|PER_WORKER,
  out_files_per_proc=k)`` — intra-partition shuffle on write for training
  randomness (docs/source/core_features.md:67-69, test_dask_nvt.py:108) ->
  ``write_parquet``.
"""

from __future__ import annotations

import enum
from typing import Optional, Union

import numpy as np
import pyarrow as pa


class Shuffle(enum.Enum):
    PER_PARTITION = "per_partition"  # permute rows inside each block
    PER_WORKER = "per_worker"  # permute inside blocks after coalescing
    FULL = "full"  # global random_shuffle (strongest, most expensive)


def read_dataset(
    paths: Union[str, list[str]],
    engine: str = "parquet",
    columns: Optional[list[str]] = None,
    part_size: Optional[int] = None,
    names: Optional[list[str]] = None,
    **kw,
):
    """Multi-file parquet/csv reader -> ray.data.Dataset.

    ``part_size`` (bytes) maps to DataContext.target_max_block_size for the
    read — the analog of the reference's partition sizing knob."""
    import ray.data as rd

    if part_size:
        from ray.data import DataContext

        DataContext.get_current().target_max_block_size = int(part_size)
    if engine == "parquet":
        return rd.read_parquet(paths, columns=columns, **kw)
    if engine == "csv":
        import pyarrow.csv as pacsv

        read_options = None
        if names:
            read_options = pacsv.ReadOptions(column_names=names)
        ds = rd.read_csv(paths, read_options=read_options, **kw)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    if engine in ("json", "jsonl"):
        # line-delimited JSON — the lingua franca of LLM corpora. Arrow's
        # block-based NDJSON parser underneath; one task per file/block.
        ds = rd.read_json(paths, **kw)
        if columns:
            ds = ds.select_columns(columns)
        return ds
    raise ValueError(f"unsupported engine {engine}")


def write_parquet(
    ds,
    path: str,
    shuffle: Optional[Shuffle] = None,
    out_files_per_proc: Optional[int] = None,
    seed: int = 42,
    num_threads: Optional[int] = None,
    **kw,
):
    """Write with optional shuffle-on-write.

    PER_PARTITION permutes rows within each Arrow block in a final
    map_batches (cheap, no data movement — the reference default for
    training-order randomness); FULL is a global random_shuffle (all-to-all).
    ``out_files_per_proc`` ~ output file count via repartition.
    ``num_threads`` ≙ the reference writer's IO threading knob
    (bench/examples/dask-nvtabular-criteo-benchmark.py:226-232): maps to
    per-write-task CPU slots (Ray schedules ceil(num_threads) cores per
    write task; parquet encoding inside the task uses Arrow's thread pool).
    MEASURED on the flagship write phase (12.2M rows, 32 cpus, materialized
    input so only the write is timed): default 0.88-0.98 s, num_threads=2
    1.5-1.9 s, num_threads=4 2.0-2.2 s — reserving slots REDUCES concurrent
    write tasks, and Ray already runs one single-threaded encoder per core.
    Leave unset on CPU-rich nodes; it exists for pipelines whose per-file
    encode is genuinely multi-threaded (wide columns + heavy compression)."""
    if shuffle in (Shuffle.PER_PARTITION, Shuffle.PER_WORKER):

        def permute(t: pa.Table) -> pa.Table:
            # the seed must vary PER BATCH: [seed, num_rows] gave every
            # same-sized block the identical permutation (uniform blocks —
            # the normal case — all shared one row-order pattern). Salt
            # with a cheap CONTENT hash of the batch head: deterministic
            # across runs, distinct across (non-identical) blocks; a
            # process counter would reset with each task's fresh pickle.
            from nvtabular_ray.functions.hashing import hash64_columns

            head = t.slice(0, min(t.num_rows, 64)).select(t.column_names[:1])
            salt = int(np.bitwise_xor.reduce(hash64_columns(head, head.column_names)))
            rng = np.random.default_rng([seed, t.num_rows, salt])
            return t.take(pa.array(rng.permutation(t.num_rows)))

        # PER_WORKER mixes rows ACROSS the blocks a task holds (the
        # reference's stronger mode): coalesce up to 4M rows per batch
        # before permuting; PER_PARTITION keeps block-local permutes.
        bs = 4_000_000 if shuffle is Shuffle.PER_WORKER else None
        ds = ds.map_batches(permute, batch_format="pyarrow", batch_size=bs)
    elif shuffle is Shuffle.FULL:
        ds = ds.random_shuffle(seed=seed)
    if out_files_per_proc:
        ds = ds.repartition(out_files_per_proc)
    if num_threads:
        kw.setdefault("ray_remote_args", {"num_cpus": float(num_threads)})
    ds.write_parquet(path, **kw)
    return path
