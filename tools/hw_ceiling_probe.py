"""Measure this box's parallel-scaling ceilings — the denominators for the
north rule's N→4N efficiency grading (BENCH.md "Hardware scaling ceilings").

Two multiprocess probes, no Spark:
- busy loop: pure-compute scaling (scheduler/turbo effects only)
- STREAM-style: each process sums a 64 MB uint64 array repeatedly —
  aggregate memory bandwidth; on a single socket this saturates the one
  memory bus and caps ANY bytes-heavy software (a shuffle-bound engine
  included) well below 1.0.

Usage: python tools/hw_ceiling_probe.py [--secs 3] [--procs 1,4,8,16,32]
Prints one JSON line with per-level rates and the 4->16 / 8->32 efficiencies.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time


def _busy(q, secs: float) -> None:
    t0 = time.time()
    n = 0
    x = 1.0001
    while time.time() - t0 < secs:
        for _ in range(10000):
            x = x * 1.000001 % 7.3
        n += 1
    q.put(n)


def _stream(q, secs: float) -> None:
    import numpy as np

    a = np.arange(8 * 1024 * 1024, dtype=np.uint64)  # 64 MB, beyond LLC share
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        a.sum()
        n += 1
    q.put(n)


def run(kind, nproc: int, secs: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=kind, args=(q, secs)) for _ in range(nproc)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=3.0)
    ap.add_argument("--procs", default="1,4,8,16,32")
    args = ap.parse_args()
    levels = [int(x) for x in args.procs.split(",")]
    out: dict = {"metric": "hw_scaling_ceilings", "secs_per_level": args.secs}
    for name, fn in (("busy_loop", _busy), ("stream_64mb_sum", _stream)):
        rates = {n: round(run(fn, n, args.secs), 1) for n in levels}
        out[name] = {"rates_per_sec": rates}
        for lo, hi in ((4, 16), (8, 32)):
            if lo in rates and hi in rates:
                out[name][f"eff_{lo}_to_{hi}"] = round(rates[hi] / rates[lo] / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
