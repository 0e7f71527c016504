"""Distributed EXACT quantiles by iterative histogram refinement.

The reference computes medians with Dask's approximate quantile
(/root/reference/nvtabular/ops/fill.py:116-119). We do better while staying
fully streaming: each round is one ``map_batches`` pass producing a
fixed-width histogram of the current candidate interval per column (a few KB
per batch), merged on the driver; the interval containing the target rank
narrows ~4096x per round, so 2-3 rounds pinpoint the quantile even at
10^12 rows. A final pass collects only the handful of values left in the
interval and interpolates exactly (pandas/DuckDB 'linear' semantics).
Nothing but O(buckets) state ever leaves the workers.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from nvtabular_ray.arrow_utils import as_single_chunk, is_list_type
from nvtabular_ray.ops.moments import column_moments

_NBUCKETS = 4096


def _clean_np(table: pa.Table, col: str) -> np.ndarray:
    arr = as_single_chunk(table.column(col))
    if is_list_type(arr.type):
        arr = arr.flatten()
    vals = pc.cast(arr.drop_null(), pa.float64()).to_numpy(zero_copy_only=False)
    return vals[~np.isnan(vals)]


def distributed_quantiles(
    ds,
    cols: list[str],
    q: float = 0.5,
    collect_threshold: int = 100_000,
    max_rounds: int = 8,
) -> dict[str, float]:
    """Exact q-quantile (linear interpolation) per column of a Dataset."""
    stats = column_moments(ds, cols)
    state = {}
    for c in cols:
        st = stats[c]
        n = st["count"]
        if n == 0:
            state[c] = None
            continue
        pos = (n - 1) * q
        state[c] = {
            "lo": st["min"],
            "hi": st["max"],
            "below": 0,
            "r0": int(math.floor(pos)),
            "r1": int(math.ceil(pos)),
            "frac": pos - math.floor(pos),
            "n_range": n,
            "done": st["min"] == st["max"],
            "value": st["min"] if st["min"] == st["max"] else None,
        }

    results: dict[str, float] = {c: s["value"] for c, s in state.items() if s is None or s.get("done")}

    for _ in range(max_rounds):
        active = [
            c
            for c, s in state.items()
            if s is not None and not s["done"] and s["n_range"] > collect_threshold
        ]
        if not active:
            break
        bounds = {c: (state[c]["lo"], state[c]["hi"]) for c in active}

        def hist_batch(t: pa.Table, bounds=bounds, active=tuple(active)) -> pa.Table:
            names, hists = [], []
            for c in active:
                lo, hi = bounds[c]
                v = _clean_np(t, c)
                v = v[(v >= lo) & (v <= hi)]
                h, _ = np.histogram(v, bins=_NBUCKETS, range=(lo, hi))
                names.append(c)
                hists.append(h.astype(np.int64))
            return pa.table({"col": pa.array(names), "hist": pa.array(list(hists), pa.list_(pa.int64()))})

        merged: dict[str, np.ndarray] = {c: np.zeros(_NBUCKETS, np.int64) for c in active}
        for row in ds.map_batches(hist_batch, batch_format="pyarrow", zero_copy_batch=True).take_all():
            merged[row["col"]] += np.asarray(row["hist"], dtype=np.int64)

        for c in active:
            s = state[c]
            h = merged[c]
            edges = np.linspace(s["lo"], s["hi"], _NBUCKETS + 1)
            cum = np.cumsum(h)
            k0 = s["r0"] - s["below"]
            k1 = s["r1"] - s["below"]
            b0 = int(np.searchsorted(cum, k0 + 1))
            b1 = int(np.searchsorted(cum, k1 + 1))
            b0 = min(b0, _NBUCKETS - 1)
            b1 = min(b1, _NBUCKETS - 1)
            new_lo, new_hi = edges[b0], edges[b1 + 1]
            s["below"] += int(cum[b0 - 1]) if b0 > 0 else 0
            s["n_range"] = int(cum[b1] - (cum[b0 - 1] if b0 > 0 else 0))
            s["lo"], s["hi"] = new_lo, new_hi
            if new_lo == new_hi or s["n_range"] <= 0:
                s["done"] = True
                s["value"] = new_lo
        for c in active:
            if state[c]["done"]:
                results[c] = state[c]["value"]

    # final exact collect of the (small) remaining candidate intervals
    active = [c for c, s in state.items() if s is not None and not s["done"]]
    if active:
        bounds = {c: (state[c]["lo"], state[c]["hi"]) for c in active}

        def collect_batch(t: pa.Table, bounds=bounds, active=tuple(active)) -> pa.Table:
            names, vals = [], []
            for c in active:
                lo, hi = bounds[c]
                v = _clean_np(t, c)
                v = v[(v >= lo) & (v <= hi)]
                names.extend([c] * len(v))
                vals.append(v)
            return pa.table(
                {"col": pa.array(names, pa.string()),
                 "val": pa.array(np.concatenate(vals) if vals else np.array([], np.float64))}
            )

        rows = ds.map_batches(collect_batch, batch_format="pyarrow", zero_copy_batch=True).take_all()
        by_col: dict[str, list] = {c: [] for c in active}
        for r in rows:
            by_col[r["col"]].append(r["val"])
        for c in active:
            s = state[c]
            v = np.sort(np.asarray(by_col[c], dtype=np.float64))
            i0 = min(max(s["r0"] - s["below"], 0), len(v) - 1)
            i1 = min(max(s["r1"] - s["below"], 0), len(v) - 1)
            v0, v1 = float(v[i0]), float(v[i1])
            results[c] = v0 + (v1 - v0) * s["frac"]

    # interpolation for columns finished during refinement (r0==r1 or collapsed)
    for c, s in state.items():
        if s is not None and s.get("done") and c not in results:
            results[c] = s["value"]
    return results
