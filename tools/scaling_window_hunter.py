"""Probe-gated N→4N campaign launcher for the elastic-clock sandbox VM.

The box alternates throttled/full-speed windows on a minutes timescale
(BENCH.md "Hardware scaling ceilings"), so unpaired campaign draws are a
lottery. This tool removes the luck: loop a cheap solo hardware probe and
only launch a paired interleaved `bench.py --scaling` campaign when the
window is measurably full-speed (single-proc busy rate AND STREAM 8→32
ceiling above thresholds), bracketing each campaign with probes.

Usage:
  python tools/scaling_window_hunter.py --out campaigns_r4/pairX \
      [--min-busy 2100] [--min-stream 0.70] [--max-minutes 120] [--campaigns 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "hw_ceiling_probe.py"),
         "--secs", "10", "--procs", "1,8,32"],
        capture_output=True, text=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output prefix (e.g. campaigns_r4/pair7)")
    ap.add_argument("--min-busy", type=float, default=2100.0,
                    help="min single-proc busy-loop rate (full-speed ≈ 2100-2300)")
    ap.add_argument("--min-stream", type=float, default=0.70,
                    help="min STREAM 8→32 efficiency ceiling")
    ap.add_argument("--max-minutes", type=float, default=120.0)
    ap.add_argument("--campaigns", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sleep-s", type=float, default=150.0)
    args = ap.parse_args()

    t0 = time.time()
    captured = 0
    attempt = 0
    while captured < args.campaigns and (time.time() - t0) < args.max_minutes * 60:
        p = probe()
        busy1 = p["busy_loop"]["rates_per_sec"]["1"]
        stream = p["stream_64mb_sum"]["eff_8_to_32"]
        good = busy1 >= args.min_busy and stream >= args.min_stream
        print(json.dumps({"gate": good, "busy1": busy1, "stream_8_32": stream,
                          "elapsed_min": round((time.time() - t0) / 60, 1)}), flush=True)
        if not good:
            time.sleep(args.sleep_s)
            continue
        attempt += 1
        pre_path = f"{args.out}_a{attempt}_probe_pre.json"
        with open(pre_path, "w") as f:
            json.dump(p, f)
        env = dict(os.environ,
                   SPARK_GRAFT_SCALING_CONVS=os.environ.get("SPARK_GRAFT_SCALING_CONVS", "400000"),
                   SPARK_GRAFT_SCALING_CPUS=os.environ.get("SPARK_GRAFT_SCALING_CPUS", "8,32"),
                   SPARK_GRAFT_SCALING_REPS=str(args.reps),
                   SPARK_GRAFT_CORPUS_DIR=os.environ.get("SPARK_GRAFT_CORPUS_DIR", "/tmp/idr_corpus_400k"))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                             capture_output=True, text=True, env=env)
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith('{"metric"')]
        post = probe()
        with open(f"{args.out}_a{attempt}_probe_post.json", "w") as f:
            json.dump(post, f)
        if not lines:
            print(json.dumps({"campaign": attempt, "error": out.stderr[-2000:]}), flush=True)
            continue
        res = json.loads(lines[-1])
        with open(f"{args.out}_a{attempt}.json", "w") as f:
            json.dump(res, f)
        captured += 1
        print(json.dumps({"campaign": attempt, "value": res["value"],
                          "paired": res["paired_ratios_per_rep"],
                          "post_stream_8_32": post["stream_64mb_sum"]["eff_8_to_32"]}), flush=True)
    print(json.dumps({"done": True, "captured": captured,
                      "elapsed_min": round((time.time() - t0) / 60, 1)}), flush=True)


if __name__ == "__main__":
    main()
