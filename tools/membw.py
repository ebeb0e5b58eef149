"""Memory-bandwidth envelope for the scaling-efficiency gate.

Measures aggregate DRAM streaming bandwidth at N concurrent processes —
the hardware ceiling that bounds ANY memory-traffic-heavy kernel's N→4N
scaling on a single box (one memory controller shared by all workers; a
real 4N-executor cluster adds controllers with the cores).

Each worker numpy-sums a pre-touched 100 MB float64 array repeatedly for a
fixed wall window (barrier start), so the measurement is pure streaming
reads with no allocator or Python-loop component. Output: one JSON line
with aggregate GB/s per process count and the 8→32 envelope ratio, i.e.
the BEST possible 8→32 efficiency for a DRAM-bound workload on this box.

    python tools/membw.py            # counts 2 8 16 32
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

ARR_MB = 100
WINDOW_SEC = 3.0


def _worker(barrier, out_q):
    import numpy as np

    arr = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    arr.sum()  # pre-touch pages
    barrier.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < WINDOW_SEC:
        arr.sum()
        n += 1
    dt = time.time() - t0
    out_q.put(n * ARR_MB / 1024.0 / dt)  # GB/s for this process


def measure(n_procs: int) -> float:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(n_procs)
    out_q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(barrier, out_q)) for _ in range(n_procs)]
    for p in procs:
        p.start()
    rates = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    return round(sum(rates), 1)


if __name__ == "__main__":
    counts = [2, 8, 16, 32]
    agg = {n: measure(n) for n in counts}
    print(json.dumps({
        "metric": "dram_stream_gbps",
        "per_count": agg,
        "envelope_8_to_32": round(agg[32] / agg[8] / 4.0, 3),
        "arr_mb": ARR_MB,
        "window_sec": WINDOW_SEC,
    }))
