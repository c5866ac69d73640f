"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship
transcripts identity-resolution pipeline (FULL mode) with turns/sec.

Prints ONE JSON line:
  {"metric": "total_bench_seconds", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "idr": {...}}

Each query is forced end-to-end with the noop writer (full plan execution,
no driver collect). Run `python bench.py --scaling` to additionally measure
local[8] vs local[32] scaling efficiency (writes BENCH.md evidence; spawns
subprocesses so each parallelism level gets a fresh JVM).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

BENCH_QUERIES = [
    "identifier_extraction",
    "group_sizes",
    "anchor_edges",
    "connected_components",
    "cluster_sizes",
    "cluster_confidence",
    "survivorship_golden",
    "impacted_subgraph",
    "monitoring_rollup",
    "topk_heavy_identifiers",
    "watermark_delta_scan",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_bench(n_conversations: int | None = None) -> dict:
    from sql_identity_resolution_spark.session import build_session
    from sql_identity_resolution_spark.plans.testdata_queries import QUERIES

    spark = build_session(app_name="idr-bench", master=f"local[{CPUS}]")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # warm the JVM/codegen once so per-query numbers measure the plan, not startup
    _force(QUERIES["identifier_extraction"](spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _force(QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship pipeline: synthetic transcripts sized to the scale factor
    from sql_identity_resolution_spark import EngineConfig, IDRPipeline
    from sql_identity_resolution_spark.datagen import generate_transcripts, write_transcripts
    from sql_identity_resolution_spark.sources.transcripts import transcripts_source

    if n_conversations is None:
        n_conversations = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "4000"))
    tmp = tempfile.mkdtemp(prefix="idr_bench_")
    try:
        gen = generate_transcripts(n_conversations=n_conversations, seed=42)
        paths = write_transcripts(gen, tmp)
        n_turns = len(gen.turns)
        source, rules, mappings = transcripts_source("chat", paths["turns"])
        cfg = EngineConfig(warehouse=f"{tmp}/wh", sources=[source], rules=rules, mappings=mappings)
        t0 = time.time()
        res = IDRPipeline(spark, cfg).run("FULL")
        idr_sec = round(time.time() - t0, 3)
        idr = {
            "seconds": idr_sec,
            "n_conversations": n_conversations,
            "n_turns": n_turns,
            "turns_per_sec": round(n_turns / idr_sec, 1),
            "entities_per_sec": round(n_conversations / idr_sec, 1),
            "edges": res.edges_created,
            "lp_iterations": res.lp_iterations,
            "stage_seconds": res.stage_seconds,
        }
        timings["idr_full_pipeline"] = idr_sec
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(CPUS),
        "idr": idr,
    }


def run_scaling() -> None:
    """Evidence for the north rule's N→4N scaling efficiency: same job at
    local[8] and local[32] in fresh JVMs (BASELINE.md methodology).

    Uses a larger corpus than the per-round bench: scaling efficiency is only
    meaningful when compute dominates fixed scheduler overhead (at 4k convs the
    job is overhead-bound and local[8]≈local[32] by construction)."""
    results = {}
    convs = os.environ.get("SPARK_GRAFT_SCALING_CONVS", "24000")
    for cpus in (8, 32):
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            SPARK_GRAFT_BENCH_CONVS=convs,
            SPARK_GRAFT_SHUFFLE=str(cpus * 2),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env, capture_output=True, text=True
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["idr"]["turns_per_sec"]
    t32 = results[32]["idr"]["turns_per_sec"]
    eff = round((t32 / t8) / 4.0, 3)
    q8 = results[8]["value"]
    q32 = results[32]["value"]
    qeff = round((q8 / q32) / 4.0, 3)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_idr_8_to_32",
                "value": eff,
                "unit": "ratio",
                "idr_turns_per_sec": {"local8": t8, "local32": t32},
                "bench_total_sec": {"local8": q8, "local32": q32},
                "bench_speedup_eff": qeff,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
