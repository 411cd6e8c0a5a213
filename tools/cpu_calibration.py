"""Host CPU-scaling calibration (no Spark).

Measures how raw multiprocess numpy throughput scales with process count to
establish the HARDWARE ceiling for any strong-scaling claim made by
tools/scaling_bench.py. On this sandbox the host throttles sustained
aggregate compute to ~14 cores' worth: 32 claimed vCPUs deliver ~1.9× the
throughput of 8, while 2→8 scales at ~0.9 efficiency. Spark-level scaling
numbers must therefore be read against this curve, and the N→4N evidence
pair must sit inside the unthrottled regime.

Usage: python tools/cpu_calibration.py  → one JSON line + BENCH/cpu_calibration.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _work(_):
    a = np.random.RandomState(0).rand(100_000)  # ~800 KB, cache-resident
    for _ in range(8000):
        np.multiply(a, 0.9999, out=a)
        np.add(a, 0.0001, out=a)
    return 0


def measure(n: int) -> float:
    with mp.Pool(n) as p:
        p.map(_work, range(n))  # warm-up wave
        t0 = time.time()
        p.map(_work, range(2 * n))  # two waves to smooth scheduling
        wall = time.time() - t0
    return 2 * n / wall  # tasks/sec


def main():
    levels = [1, 2, 4, 8, 16, 32]
    thr = {n: round(measure(n), 2) for n in levels}
    result = {
        "workload": "in-place numpy multiply+add on 800KB arrays (cache-resident)",
        "throughput_tasks_per_sec": thr,
        "efficiency_2_to_8": round((thr[8] / thr[2]) / 4, 3),
        "efficiency_8_to_32": round((thr[32] / thr[8]) / 4, 3),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cpu_calibration.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
