"""Analyze a Spark event log: per-stage wall time, summed task time, and
parallelism efficiency — finds the stages that don't scale.

Usage: python tools/evlog_analyze.py /root/evlogs/<app-id> [--top N]
Prints one line per stage sorted by wall time, plus totals and the
serial (no-stage-running) gap time between first and last stage.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def analyze(path: str, top: int = 25):
    stages = {}  # (stageId, attempt) -> dict
    tasks = defaultdict(lambda: {"run": 0, "n": 0, "gc": 0, "cpu": 0,
                                 "shuffle_read": 0, "shuffle_write": 0, "result_ser": 0, "deser": 0})
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev.get("Timestamp")
            elif e == "SparkListenerApplicationEnd":
                app_end = ev.get("Timestamp")
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si["Stage Attempt ID"])
                stages[key] = {
                    "name": si["Stage Name"],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                    "ntasks": si.get("Number of Tasks"),
                }
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                t = tasks[key]
                t["n"] += 1
                t["run"] += m.get("Executor Run Time", 0)
                t["cpu"] += m.get("Executor CPU Time", 0) / 1e6  # ns -> ms
                t["gc"] += m.get("JVM GC Time", 0)
                t["deser"] += m.get("Executor Deserialize Time", 0)
                t["result_ser"] += m.get("Result Serialization Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                t["shuffle_read"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                t["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)

    rows = []
    for key, s in stages.items():
        if s["submit"] is None or s["complete"] is None:
            continue
        wall = (s["complete"] - s["submit"]) / 1000.0
        t = tasks[key]
        rows.append({
            "stage": key[0],
            "wall_s": round(wall, 1),
            "task_s": round(t["run"] / 1000.0, 1),
            "cpu_s": round(t["cpu"] / 1000.0, 1),
            "gc_s": round(t["gc"] / 1000.0, 1),
            "ntasks": s["ntasks"],
            "sh_rd_mb": round(t["shuffle_read"] / 1e6, 1),
            "sh_wr_mb": round(t["shuffle_write"] / 1e6, 1),
            "name": s["name"].split("\n")[0][:90],
        })
    rows.sort(key=lambda r: -r["wall_s"])
    total_wall = sum(r["wall_s"] for r in rows)
    # gap time: union of stage intervals vs app window
    ivs = sorted((s["submit"], s["complete"]) for s in stages.values()
                 if s["submit"] and s["complete"])
    covered = 0
    cur_s = cur_e = None
    for a, b in ivs:
        if cur_e is None or a > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = a, b
        else:
            cur_e = max(cur_e, b)
    if cur_e is not None:
        covered += cur_e - cur_s
    app_wall = ((app_end or cur_e) - (app_start or cur_s)) / 1000.0
    print(f"app_wall={app_wall:.1f}s stage_covered={covered/1000.0:.1f}s "
          f"no_stage_gap={app_wall - covered/1000.0:.1f}s n_stages={len(rows)}")
    print(f"{'stage':>5} {'wall':>7} {'task':>8} {'cpu':>8} {'gc':>6} {'par':>5} "
          f"{'shR_MB':>8} {'shW_MB':>8}  name")
    for r in rows[:top]:
        par = r["task_s"] / r["wall_s"] if r["wall_s"] > 0 else 0
        print(f"{r['stage']:>5} {r['wall_s']:>7} {r['task_s']:>8} {r['cpu_s']:>8} "
              f"{r['gc_s']:>6} {par:>5.1f} {r['sh_rd_mb']:>8} {r['sh_wr_mb']:>8}  {r['name']}")


def gaps(path: str, min_gap_ms: int = 500):
    """Print the largest no-stage-running windows with the stage that follows
    each (what the driver was preparing during the gap)."""
    stages = []
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                if si.get("Submission Time") and si.get("Completion Time"):
                    stages.append((si["Submission Time"], si["Completion Time"],
                                   si["Stage ID"], si["Stage Name"].split("\n")[0][:70]))
    stages.sort()
    out = []
    cur_end = stages[0][0]
    for sub, comp, sid, name in stages:
        if sub > cur_end + min_gap_ms:
            out.append((sub - cur_end, sid, name))
        cur_end = max(cur_end, comp)
    out.sort(reverse=True)
    total = sum(g for g, _, _ in out)
    print(f"total_gap>{min_gap_ms}ms = {total/1000.0:.1f}s in {len(out)} windows")
    for g, sid, name in out[:20]:
        print(f"  {g/1000.0:6.1f}s before stage {sid}: {name}")


if __name__ == "__main__":
    top = 25
    if "--top" in sys.argv:
        i = sys.argv.index("--top")
        top = int(sys.argv[i + 1])
    if "--gaps" in sys.argv:
        gaps(sys.argv[1])
    else:
        analyze(sys.argv[1], top)
