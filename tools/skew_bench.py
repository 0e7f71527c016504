"""Hot-entity skew benchmark (north-rule skew mitigation evidence).

One pathologically hot conversation (HOT_ROWS turns) amid many small ones.
Runs the SAME ordered-feature specs (lag + sessionize + rolling + expanding)
two ways over identical input:

  baseline  ordered_features(hot_threshold=inf) — the plain one-entity-one-
            bucket plan (the bucketed_group_map shape every temporal op
            uses): the hot conv lands in ONE bucket -> one task sorts and
            computes HOT_ROWS rows while the rest of the cluster idles.
  split     ordered_features(defaults) — the hot conv is torn into
            ~TARGET_SEG_ROWS time segments, exact via halos + carries.

Prints one JSON line per leg plus a summary with the speedup and an
output-equality check (NaN-aware per-column sums). Usage:

    python tools/skew_bench.py            # 8 cpus, 4M hot + 4M cold rows
    SKEW_CPUS=32 SKEW_HOT_ROWS=8000000 python tools/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

CPUS = int(os.environ.get("SKEW_CPUS", "8"))
HOT_ROWS = int(os.environ.get("SKEW_HOT_ROWS", "4000000"))
COLD_CONVS = int(os.environ.get("SKEW_COLD_CONVS", "40000"))
COLD_ROWS = int(os.environ.get("SKEW_COLD_ROWS", "100"))
SEG_ROWS = int(os.environ.get("SKEW_SEG_ROWS", "250000"))
CACHE = f"/tmp/nvtr_skew_{HOT_ROWS}_{COLD_CONVS}x{COLD_ROWS}"

SPECS = [
    {"kind": "lag", "col": "value", "shift": 1},
    {"kind": "sessionize", "gap": 300, "out": "session_id"},
    {"kind": "rolling", "col": "value", "window": 600, "aggs": ["count", "mean"]},
    {"kind": "expanding", "col": "value", "aggs": ["count", "sum"]},
]


def _gen():
    if os.path.exists(os.path.join(CACHE, "_SUCCESS")):
        return
    os.makedirs(CACHE, exist_ok=True)
    rng = np.random.default_rng(7)
    files = 64

    # hot conversation: HOT_ROWS turns, 1-30 s gaps
    hot_ts = np.cumsum(rng.integers(1, 30, size=HOT_ROWS).astype(np.int64))
    hot = pa.table(
        {
            "conv_id": pa.array(np.full(HOT_ROWS, "HOT"), pa.string()),
            "ts": pa.array(hot_ts * 1_000_000, pa.timestamp("us")),
            "value": pa.array(rng.normal(size=HOT_ROWS)),
        }
    )
    # cold conversations: COLD_CONVS x COLD_ROWS, 1-600 s gaps
    n = COLD_CONVS * COLD_ROWS
    cids = np.repeat([f"c{i:06d}" for i in range(COLD_CONVS)], COLD_ROWS)
    gaps = rng.integers(1, 600, size=n).astype(np.int64)
    first = np.zeros(n, dtype=bool)
    first[::COLD_ROWS] = True
    gaps[first] = rng.integers(0, 10**6, size=COLD_CONVS)
    cold_ts = np.cumsum(gaps)
    reset = np.repeat(np.r_[0, cold_ts[::COLD_ROWS][1:] - gaps[first][1:]], COLD_ROWS)
    cold = pa.table(
        {
            "conv_id": pa.array(cids, pa.string()),
            "ts": pa.array((cold_ts - reset) * 1_000_000, pa.timestamp("us")),
            "value": pa.array(rng.normal(size=n)),
        }
    )
    both = pa.concat_tables([hot, cold])
    # interleave blocks so the hot conv spans many input files (realistic:
    # a mega-conv arrives across many shards)
    perm = rng.permutation(both.num_rows)
    both = both.take(pa.array(perm))
    step = both.num_rows // files + 1
    for f in range(files):
        pq.write_table(both.slice(f * step, step), f"{CACHE}/part-{f:03d}.parquet")
    open(os.path.join(CACHE, "_SUCCESS"), "w").close()


def _col_sums(out) -> dict:
    """NaN/null-aware per-column sums (the expanding sum's first row per
    entity is NaN by SQL semantics — a plain sum would poison the check)."""
    sums: dict[str, float] = {}
    rows = 0
    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows += b.num_rows
        for c in b.column_names:
            if c in ("conv_id", "ts"):
                continue
            arr = (
                b.column(c).combine_chunks().cast(pa.float64())
                .to_numpy(zero_copy_only=False)
            )
            sums[c] = sums.get(c, 0.0) + float(np.nansum(arr))
    sums["__rows__"] = rows
    return sums


def _leg(ds, hot_threshold: int) -> tuple[float, dict]:
    from nvtabular_ray.pipelines.hot_split import ordered_features

    t0 = time.perf_counter()
    out = ordered_features(
        ds, "conv_id", "ts", SPECS, hot_threshold=hot_threshold, target_seg_rows=SEG_ROWS
    )
    sums = _col_sums(out)
    return time.perf_counter() - t0, sums


def main():
    import ray
    import ray.data as rd

    _gen()
    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    results = {}
    for name, thr in (("warmup", 1 << 62), ("baseline_one_bucket", 1 << 62),
                      ("hot_split", max(SEG_ROWS, 1_000_000))):
        ds = rd.read_parquet(CACHE, columns=["conv_id", "ts", "value"])
        sec, sums = _leg(ds, thr)
        if name == "warmup":
            continue
        results[name] = {"sec": round(sec, 2), "sums": sums}
        print(json.dumps({"leg": name, "sec": round(sec, 2),
                          "rows": sums["__rows__"], "cpus": CPUS}))

    a, b = results["baseline_one_bucket"], results["hot_split"]
    keys = sorted(set(a["sums"]) | set(b["sums"]))
    match = all(np.isclose(a["sums"].get(k, np.nan), b["sums"].get(k, np.nan),
                           rtol=1e-8, atol=1e-6) for k in keys)
    print(json.dumps({
        "metric": "hot_entity_skew_speedup",
        "hot_rows": HOT_ROWS,
        "total_rows": a["sums"]["__rows__"],
        "cpus": CPUS,
        "baseline_sec": a["sec"],
        "split_sec": b["sec"],
        "speedup": round(a["sec"] / b["sec"], 2),
        "outputs_match": bool(match),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
