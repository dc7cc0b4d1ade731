#!/usr/bin/env python3
"""Host-capacity probe: can THIS box deliver 4x aggregate CPU
throughput from 8 to 32 pinned worker processes?

Pure numpy work (no Spark, no JVM, no IO): each worker loops a fixed
kernel (hash-mix + sort on a private array — branchy int work like
posting-block encode) for a fixed wall window and reports iterations.
Aggregate iters/sec at N workers pinned to CPUs 0..N-1 is the host's
delivered capacity at that width.  Efficiency = (agg_32 / agg_8) / 4.

If THIS number is far below 0.8, no Spark job on the box can meet the
north rule's 0.8 gate — the sandbox's 32 "CPUs" do not back 4x the
cycles of 8 — and the scaling evidence must be read against the
host's own ceiling (report both, plus the ratio-of-ratios).

Usage: python scripts/probe_host_scaling.py [--secs 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

import numpy as np


def worker(cpu: int, secs: float, out: "mp.Queue",
           kernel: str = "cpu") -> None:
    os.sched_setaffinity(0, {cpu})
    rng = np.random.default_rng(cpu + 1)
    if kernel == "mem":
        # bandwidth-bound: stream over a 128 MB working set (far
        # beyond LLC share) — models the tokenize/posting-sort stages,
        # which touch big arrays once, unlike the L2-resident kernel
        a = rng.integers(0, 1 << 30, size=16_000_000, dtype=np.uint64)
        b = np.empty_like(a)
        mix = np.uint64(0x9E3779B97F4A7C15)
        t_end = time.perf_counter() + secs
        iters = 0
        while time.perf_counter() < t_end:
            np.multiply(a, mix, out=b)
            np.add(b, a, out=b)
            iters += 1
        out.put(iters)
        return
    a = rng.integers(0, 1 << 30, size=200_000, dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)
    sh = np.uint64(31)
    mod = np.uint64(65536)
    t_end = time.perf_counter() + secs
    iters = 0
    while time.perf_counter() < t_end:
        b = a * mix
        b ^= b >> sh
        np.sort(b % mod)
        iters += 1
    out.put(iters)


def measure(n: int, secs: float, kernel: str = "cpu") -> float:
    q: "mp.Queue" = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, secs, q, kernel))
          for i in range(n)]
    t0 = time.perf_counter()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    return total / wall


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--kernel", choices=("cpu", "mem"), default="cpu",
                    help="cpu = L2-resident hash+sort (stable); mem = "
                         "128 MB/worker DRAM streaming (exposes the "
                         "shared memory-bus ceiling, very noisy)")
    args = ap.parse_args()

    pairs = []
    lows, highs = [], []
    for _ in range(args.reps):
        lo = measure(args.low, args.secs, args.kernel)
        hi = measure(args.high, args.secs, args.kernel)
        lows.append(lo)
        highs.append(hi)
        pairs.append((hi / lo) / (args.high / args.low))
    result = {
        "kernel": ("hash-mix + sort, 200k int64 (L2-resident), private "
                   "per worker" if args.kernel == "cpu" else
                   "DRAM streaming, 128 MB working set per worker"),
        "low_workers": args.low,
        "high_workers": args.high,
        "agg_iters_per_sec_low": [round(x, 1) for x in lows],
        "agg_iters_per_sec_high": [round(x, 1) for x in highs],
        "pair_efficiencies": [round(x, 3) for x in pairs],
        "host_scaling_efficiency_median": round(sorted(pairs)[len(pairs) // 2], 3),
    }
    print(json.dumps(result, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
