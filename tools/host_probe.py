"""Host-condition probe: quantifies what the sandbox actually provides
TODAY, so bench numbers can be judged against the hardware that produced
them (this VM's effective capacity swings hour to hour).

Measures three things:
  1. parallel speedup — one calibrated pure-CPU task alone vs 32 launched
     together (round-2 calibration read 11.4x: ~11 effective cores behind
     the advertised 32),
  2. memory bandwidth — single-threaded big-buffer copy, the resource the
     8-core bench leg saturates first,
  3. hypervisor steal — /proc/stat ticks across the probe.

Usage: python tools/host_probe.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import time


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _spin(seconds: float) -> int:
    """Pure-CPU work unit (no memory traffic beyond cache)."""
    t0 = time.perf_counter()
    x, n = 1.0, 0
    while time.perf_counter() - t0 < seconds:
        for _ in range(10_000):
            x = x * 1.0000001 % 97.0
        n += 1
    return n


def main():
    import numpy as np
    import ray

    s0 = _steal()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)

    spin = ray.remote(num_cpus=1)(_spin)

    # calibrate: one task alone
    t0 = time.perf_counter()
    ray.get(spin.remote(2.0))
    solo = time.perf_counter() - t0
    # 32 together
    t0 = time.perf_counter()
    ray.get([spin.remote(2.0) for _ in range(32)])
    wave = time.perf_counter() - t0
    speedup = 32 * solo / wave

    # memory bandwidth: 1 GiB copy, best of 3
    src = np.empty(1 << 30, dtype=np.uint8)
    src[::4096] = 1  # fault the pages in
    dst = np.empty_like(src)
    bw = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        bw = max(bw, 2.0 / (time.perf_counter() - t0))  # GiB moved (r+w)

    out = {
        "metric": "host_probe",
        "parallel_speedup_32tasks": round(speedup, 1),
        "solo_task_sec": round(solo, 2),
        "wave_sec": round(wave, 2),
        "memcpy_gib_per_sec": round(bw, 1),
        "steal_ticks": _steal() - s0,
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
