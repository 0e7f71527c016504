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
    import pyarrow.types as pt

    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        rows += b.num_rows
        for c in b.column_names:
            f = b.schema.field(c)
            if not (pt.is_integer(f.type) or pt.is_floating(f.type)):
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


FLAGSHIP_HOT = int(os.environ.get("SKEW_FLAGSHIP_HOT", "3000000"))
FLAGSHIP_COLD_CONVS = int(os.environ.get("SKEW_FLAGSHIP_COLD_CONVS", "30000"))
FLAGSHIP_CACHE = f"/tmp/nvtr_skew_flagship_{FLAGSHIP_HOT}_{FLAGSHIP_COLD_CONVS}"


def _gen_flagship():
    """Transcript-schema input with ONE mega conversation (FLAGSHIP_HOT
    turns) amid FLAGSHIP_COLD_CONVS normal zipf conversations."""
    if os.path.exists(os.path.join(FLAGSHIP_CACHE, "_SUCCESS")):
        return
    os.makedirs(FLAGSHIP_CACHE, exist_ok=True)
    from nvtabular_ray.transcripts import generate_transcripts

    rng = np.random.default_rng(13)
    n = FLAGSHIP_HOT
    roles = np.array(["user", "assistant", "system", "tool"])
    tools = np.array(["", "search", "code", "browse", "none"])
    text_pool = np.array(
        ["".join(rng.choice(list("abcdefg stuvwxyz"), size=L)) for L in
         rng.integers(20, 240, size=512)]
    )
    ti = rng.integers(0, len(text_pool), size=n)
    text = text_pool[ti]
    hot = pa.table(
        {
            "conv_id": pa.array(np.full(n, "HOT_CONV"), pa.string()),
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
            "role": pa.array(roles[rng.integers(0, 4, size=n)], pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tools[rng.integers(0, 5, size=n)], pa.string()),
            "ts": pa.array(np.cumsum(rng.integers(1, 40, size=n).astype(np.int64)) * 1_000_000,
                           pa.timestamp("us")),
            "text_len": pa.array(np.char.str_len(text.astype(str)).astype(np.int32)),
            "latency": pa.array(rng.exponential(1.0, size=n)),
        }
    )
    import ray.data as rd  # noqa: F401  (generator needs an active session)

    cold = generate_transcripts(FLAGSHIP_COLD_CONVS, seed=5)
    cold.write_parquet(FLAGSHIP_CACHE)
    # interleave the hot conv across many extra shards
    files = 32
    step = n // files + 1
    for f in range(files):
        pq.write_table(hot.slice(f * step, step), f"{FLAGSHIP_CACHE}/hot-{f:03d}.parquet")
    open(os.path.join(FLAGSHIP_CACHE, "_SUCCESS"), "w").close()


def main_flagship():
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _gen_flagship()
    from nvtabular_ray.pipelines.transcripts import transcript_features

    results = {}
    for name, kw in (("warmup", {"hot_threshold": 1 << 40}),
                     ("flagship_default", {}),
                     ("flagship_hot_split", {"hot_threshold": 1_000_000})):
        ds = rd.read_parquet(FLAGSHIP_CACHE)
        t0 = time.perf_counter()
        out, _ = transcript_features(ds, **kw)
        sums = _col_sums(out)
        sec = time.perf_counter() - t0
        if name == "warmup":
            continue
        results[name] = {"sec": round(sec, 2), "sums": sums}
        print(json.dumps({"leg": name, "sec": round(sec, 2),
                          "rows": sums["__rows__"], "cpus": CPUS}))

    a, b = results["flagship_default"], results["flagship_hot_split"]
    keys = sorted((set(a["sums"]) | set(b["sums"])) - {"text", "role", "tool"})
    match = all(np.isclose(a["sums"].get(k, np.nan), b["sums"].get(k, np.nan),
                           rtol=1e-8, atol=1e-6, equal_nan=True) for k in keys)
    print(json.dumps({
        "metric": "flagship_hot_conv_skew_speedup",
        "hot_turns": FLAGSHIP_HOT,
        "total_turns": a["sums"]["__rows__"],
        "cpus": CPUS,
        "default_sec": a["sec"],
        "hot_split_sec": b["sec"],
        "speedup": round(a["sec"] / b["sec"], 2),
        "outputs_match": bool(match),
    }))
    ray.shutdown()


def main_asof():
    """As-of join skew: left = the skewed table, right = every 8th row
    (a feature table with the same key skew); backward join, 8 cpus."""
    import ray
    import ray.data as rd

    from nvtabular_ray.pipelines.temporal import asof_join

    _gen()
    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    def thin(t: pa.Table) -> pa.Table:
        keep = np.arange(t.num_rows) % 8 == 0
        t = t.filter(pa.array(keep))
        return t.rename_columns(
            [{"value": "feat"}.get(c, c) for c in t.column_names]
        )

    results = {}
    legs = (("warmup", None), ("asof_one_bucket", None),
            ("asof_hot_split", max(SEG_ROWS, 1_000_000)))
    for name, thr in legs:
        left = rd.read_parquet(CACHE, columns=["conv_id", "ts", "value"])
        right = rd.read_parquet(CACHE, columns=["conv_id", "ts", "value"]).map_batches(
            thin, batch_format="pyarrow", zero_copy_batch=True
        )
        t0 = time.perf_counter()
        out = asof_join(left, right, "conv_id", "ts", right_cols=["feat"],
                        hot_threshold=thr, target_seg_rows=SEG_ROWS)
        sums = _col_sums(out)
        sec = time.perf_counter() - t0
        if name == "warmup":
            continue
        results[name] = {"sec": round(sec, 2), "sums": sums}
        print(json.dumps({"leg": name, "sec": round(sec, 2),
                          "rows": sums["__rows__"], "cpus": CPUS}))
    a, b = results["asof_one_bucket"], results["asof_hot_split"]
    keys = sorted(set(a["sums"]) | set(b["sums"]))
    match = all(np.isclose(a["sums"].get(k, np.nan), b["sums"].get(k, np.nan),
                           rtol=1e-8, atol=1e-6, equal_nan=True) for k in keys)
    print(json.dumps({
        "metric": "asof_hot_key_skew_speedup",
        "hot_rows": HOT_ROWS,
        "total_rows": a["sums"]["__rows__"],
        "cpus": CPUS,
        "baseline_sec": a["sec"],
        "split_sec": b["sec"],
        "speedup": round(a["sec"] / b["sec"], 2),
        "outputs_match": bool(match),
    }))
    ray.shutdown()


JOIN_LEFT_ROWS = int(os.environ.get("SKEW_JOIN_LEFT_ROWS", "8000000"))
JOIN_HOT_FRAC = float(os.environ.get("SKEW_JOIN_HOT_FRAC", "0.5"))
JOIN_KEYS = 5000
JOIN_RIGHT_DUP = int(os.environ.get("SKEW_JOIN_RIGHT_DUP", "2"))
JOIN_CACHE = f"/tmp/nvtr_skewjoin_{JOIN_LEFT_ROWS}_{JOIN_HOT_FRAC}_{JOIN_RIGHT_DUP}"


def _gen_join():
    if os.path.isdir(JOIN_CACHE):
        return
    rng = np.random.RandomState(7)
    os.makedirs(f"{JOIN_CACHE}/left")
    os.makedirs(f"{JOIN_CACHE}/right")
    n_hot = int(JOIN_LEFT_ROWS * JOIN_HOT_FRAC)
    k = rng.randint(0, JOIN_KEYS, JOIN_LEFT_ROWS).astype(np.int64)
    k[:n_hot] = 7
    rng.shuffle(k)
    a = rng.rand(JOIN_LEFT_ROWS)
    shard = JOIN_LEFT_ROWS // 16
    for i in range(16):
        s = slice(i * shard, JOIN_LEFT_ROWS if i == 15 else (i + 1) * shard)
        pq.write_table(pa.table({"k": k[s], "a": a[s]}), f"{JOIN_CACHE}/left/{i}.parquet")
    # JOIN_RIGHT_DUP build rows per key -> M:N multiplies every probe
    # row, hot included: the hot bucket's OUTPUT is where skew really
    # hurts (one task building hot_frac*left*dup rows)
    rk = np.repeat(np.arange(JOIN_KEYS, dtype=np.int64), JOIN_RIGHT_DUP)
    pq.write_table(
        pa.table({"rk": rk, "b": rng.rand(len(rk))}), f"{JOIN_CACHE}/right/0.parquet"
    )


def main_join():
    import ray
    import ray.data as rd

    from nvtabular_ray.pipelines.joins import shuffle_join

    _gen_join()
    ray.init(address="local", num_cpus=CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    thr_salted = max(JOIN_LEFT_ROWS // (CPUS * 8), 1000)
    # chunk cap sized so the hot bucket's probe side (~hot_frac*left*16B)
    # fans out across the cores; "auto" (2 GiB) wouldn't trigger at bench
    # sizes
    cap_chunked = max(int(JOIN_LEFT_ROWS * JOIN_HOT_FRAC * 16) // CPUS, 1 << 20)
    results = {}
    for name, thr, cap in (("warmup", None, None), ("baseline_one_bucket", None, None),
                           ("salted", thr_salted, None), ("chunked", None, cap_chunked)):
        left = rd.read_parquet(f"{JOIN_CACHE}/left")
        right = rd.read_parquet(f"{JOIN_CACHE}/right")
        t0 = time.perf_counter()
        out = shuffle_join(
            left, right, on="k", right_on="rk", how="inner",
            num_buckets=CPUS * 4, skew_threshold=thr, max_replication=CPUS,
            max_probe_bytes_per_task=cap if cap is not None else "auto",
        )
        sums = out.sum(["a", "b"])
        n = out.count()
        sec = time.perf_counter() - t0
        if name == "warmup":
            continue
        results[name] = {"sec": round(sec, 2), "sums": sums, "rows": n}
        print(json.dumps({"leg": name, "sec": round(sec, 2), "rows": n, "cpus": CPUS}))

    a, b, c = results["baseline_one_bucket"], results["salted"], results["chunked"]
    match = all(
        a["rows"] == x["rows"]
        and all(np.isclose(a["sums"][k], x["sums"][k], rtol=1e-9) for k in ("sum(a)", "sum(b)"))
        for x in (b, c)
    )
    print(json.dumps({
        "metric": "salted_join_skew_speedup",
        "left_rows": JOIN_LEFT_ROWS,
        "hot_frac": JOIN_HOT_FRAC,
        "right_dup": JOIN_RIGHT_DUP,
        "out_rows": a["rows"],
        "cpus": CPUS,
        "baseline_sec": a["sec"],
        "salted_sec": b["sec"],
        "chunked_sec": c["sec"],
        "speedup_salted": round(a["sec"] / b["sec"], 2),
        "speedup_chunked": round(a["sec"] / c["sec"], 2),
        "outputs_match": bool(match),
    }))
    ray.shutdown()


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
    if "--flagship" in sys.argv:
        main_flagship()
    elif "--asof" in sys.argv:
        main_asof()
    elif "--join" in sys.argv:
        main_join()
    else:
        main()
