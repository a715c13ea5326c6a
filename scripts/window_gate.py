#!/usr/bin/env python3
"""Cheap (~10 s) host-window probe: aggregate memory-stream bandwidth at
1 and 32 processes. On this box the engine's scaling ceiling is the shared
memory bandwidth (BENCH/BASELINE.md); co-tenant steal is invisible to CPU
counters, so the only reliable gate is measuring the bandwidth itself.

Prints one JSON line: per-proc GB/s at width 1, aggregate GB/s at width 32,
and scaling ratio (agg32 / (bw1 * 32)) — the same quantity as graft.Bench's
gen-control efficiency, in 10 s instead of 6 min.
"""
import json
import multiprocessing as mp
import time

import numpy as np

N = 32 * 1024 * 1024  # 256 MB of float64 per worker


def stream(q):
    a = np.ones(N)
    # warm-up touch, then timed passes
    s = a.sum()
    t0 = time.time()
    passes = 6
    for _ in range(passes):
        s += a.sum()
    dt = time.time() - t0
    q.put(passes * N * 8 / dt / 1e9)  # GB/s read


def run(width):
    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q,)) for _ in range(width)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


if __name__ == "__main__":
    bw1 = run(1)
    bw32 = run(32)
    ratio = bw32 / (bw1 * 32)
    print(json.dumps({"bw1_gbps": round(bw1, 2), "bw32_gbps": round(bw32, 2),
                      "ratio": round(ratio, 3)}))
