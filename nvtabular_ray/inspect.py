"""Dataset inspector CLI — profile a parquet dataset with DataStats.

    python -m nvtabular_ray.inspect /path/to/table.parquet [-o profile.json]

Analog of the reference's inspector
(/root/reference/nvtabular/tools/inspector_script.py +
dataset_inspector.py): runs the DataStats stat op over every column and
dumps a JSON profile usable by a look-alike data generator.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("-o", "--output", default=None)
    p.add_argument("--columns", default=None, help="comma-separated subset")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from nvtabular_ray import Workflow, ops

    ds = rd.read_parquet(args.path)
    cols = args.columns.split(",") if args.columns else list(ds.schema().names)
    wf = Workflow(cols >> ops.DataStats())
    wf.fit(ds)
    profile = wf._op_nodes()[0].op.output
    text = json.dumps(profile, indent=2, default=float)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
    else:
        print(text)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
