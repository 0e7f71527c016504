"""Pipeline driver — the ``ray job submit`` launch path (north rule).

Usage (local or against a cluster):

    ray job submit --working-dir . -- python -m nvtabular_ray.run \
        --config job.json

    # or directly:
    python -m nvtabular_ray.run --input /data/transcripts --output /out \
        --pipeline transcripts --resumable

Config JSON keys: input (parquet path/glob), output (dir), pipeline
("transcripts" for the flagship, or a saved-workflow dir from
Workflow.save), partition_cols, num_buckets, resumable (bool),
shuffle ("per_partition"|"full"|null), num_cpus (local only).

The script owns the Ray session (library code never calls ray.init;
under ``ray job submit`` it attaches to the cluster via RAY_ADDRESS).
Analog of the reference's CLI benchmark driver
(/root/reference/bench/examples/dask-nvtabular-criteo-benchmark.py:92-252).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", help="JSON config file; CLI flags override")
    p.add_argument("--input")
    p.add_argument("--output")
    # defaults are None so "CLI flags override the config" holds: an argparse
    # DEFAULT must never clobber an explicit config key (a saved-workflow
    # config would silently run the flagship pipeline instead)
    p.add_argument("--pipeline", default=None)
    p.add_argument("--partition-cols", default=None)
    p.add_argument("--num-buckets", type=int, default=None)
    p.add_argument("--resumable", action="store_true")
    p.add_argument("--shuffle", default=None, choices=["per_partition", "full"])
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = json.load(f)
    for k in ("input", "output", "pipeline", "num_buckets", "resumable", "shuffle"):
        v = getattr(args, k, None)
        if v not in (None, False):
            cfg[k] = v
    if args.partition_cols is not None:  # explicit CLI overrides config
        cfg["partition_cols"] = args.partition_cols.split(",")
    cfg.setdefault("pipeline", "transcripts")
    cfg.setdefault("partition_cols", ["conv_id"])
    if isinstance(cfg["partition_cols"], str):
        cfg["partition_cols"] = cfg["partition_cols"].split(",")
    if not cfg.get("input") or not cfg.get("output"):
        p.error("--input and --output (or config keys) are required")

    import ray

    if not ray.is_initialized():
        kw = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if os.environ.get("RAY_ADDRESS"):
            ray.init(**kw)  # ray job submit / cluster
        else:
            ncpu = args.num_cpus if args.num_cpus is not None else cfg.get("num_cpus")
            ray.init(address="local", num_cpus=ncpu or None, **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    t0 = time.perf_counter()
    ds = rd.read_parquet(cfg["input"])
    n_in = ds.count()

    if cfg["pipeline"] == "transcripts":
        from nvtabular_ray.pipelines.transcripts import transcript_feature_workflow

        wf = transcript_feature_workflow()
        wf.fit(ds)
    else:
        from nvtabular_ray.workflow import Workflow

        wf = Workflow.load(cfg["pipeline"])

    if cfg.get("resumable"):
        manifest = wf.transform_resumable(
            ds, cfg["output"], cfg["partition_cols"], num_buckets=cfg.get("num_buckets")
        )
        n_parts = len(manifest["completed"])
    else:
        from nvtabular_ray.sources.io import Shuffle, write_parquet

        out = wf.transform(ds, num_buckets=cfg.get("num_buckets"))
        shuffle = Shuffle(cfg["shuffle"]) if cfg.get("shuffle") else None
        write_parquet(out, cfg["output"], shuffle=shuffle)
        n_parts = None

    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "rows_in": n_in,
                "output": cfg["output"],
                "partitions": n_parts,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_in / wall, 1),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
