"""Round-6 optimization harness (NOT the frozen bench.py).

Measures the flagship FULL+INCR pipeline at the same 4k-conversation scale as
bench.py, but instruments the parts bench.py's stage_seconds cannot see:
preflight, run_state read, finalize appends (run_history/stage_metrics/
metrics_export), and per-store flush timing.  Guide §1: measure first.

Usage:
    python bench_extra.py              # flagship FULL + INCR with breakdown
    python bench_extra.py --convs N    # other scale (e.g. 100000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")


def main(n_conversations: int, reps: int = 1) -> None:
    from datetime import datetime

    from sql_identity_resolution_spark import EngineConfig, IDRPipeline
    from sql_identity_resolution_spark.datagen import generate_transcripts, write_parquet
    from sql_identity_resolution_spark.plans import pipeline as P
    from sql_identity_resolution_spark.session import build_session
    from sql_identity_resolution_spark.sources.transcripts import (
        transcripts_attributes,
        transcripts_source,
    )

    # instrument the un-staged sections by wrapping the methods
    extra: dict[str, float] = {}

    orig_preflight = IDRPipeline.preflight
    orig_history = IDRPipeline._record_history

    def timed_preflight(self, check_data=True):
        t0 = time.time()
        out = orig_preflight(self, check_data)
        extra["preflight"] = extra.get("preflight", 0.0) + time.time() - t0
        return out

    def timed_history(self, res, run_ts, stage_rows):
        t0 = time.time()
        out = orig_history(self, res, run_ts, stage_rows)
        extra["record_history"] = extra.get("record_history", 0.0) + time.time() - t0
        return out

    IDRPipeline.preflight = timed_preflight
    IDRPipeline._record_history = timed_history

    spark = build_session(app_name="idr-bench-extra", master=f"local[{CPUS}]")
    tmp = tempfile.mkdtemp(prefix="idr_bx_")
    results = []
    try:
        turns_dir = os.path.join(tmp, "turns")
        os.makedirs(turns_dir)
        gen = generate_transcripts(n_conversations=n_conversations, seed=42)
        write_parquet(gen.turns, os.path.join(turns_dir, "base.parquet"))
        source, rules, mappings = transcripts_source("chat", turns_dir)
        big = {t: 256 for t in ("identifiers_current", "entity_texts_current")}
        for rep in range(reps):
            wh = os.path.join(tmp, f"wh{rep}")
            cfg = EngineConfig(
                warehouse=wh, sources=[source], rules=rules, mappings=mappings,
                emit_duplicate_text_pairs=False,
                catalog_table_buckets=big,
                attributes=transcripts_attributes("chat"),
            )
            pipe = IDRPipeline(spark, cfg)
            extra.clear()
            t0 = time.time()
            res = pipe.run("FULL")
            full_s = round(time.time() - t0, 3)
            full_extra = dict(extra)

            n_delta = max(n_conversations // 100, 50)
            gen2 = generate_transcripts(
                n_conversations=n_delta, seed=43, start_ts=datetime(2027, 1, 1)
            )
            delta_turns = gen2.turns.copy()
            delta_turns["conv_id"] = "incr_" + delta_turns["conv_id"].astype(str)
            write_parquet(delta_turns, os.path.join(turns_dir, f"delta{rep}.parquet"))
            extra.clear()
            t0 = time.time()
            res_i = pipe.run("INCR")
            incr_s = round(time.time() - t0, 3)
            incr_extra = dict(extra)
            # remove delta so next rep's FULL sees the same base corpus
            for fn in os.listdir(turns_dir):
                if fn.startswith(f"delta{rep}"):
                    os.remove(os.path.join(turns_dir, fn))

            def gap(total, stages, ex):
                return round(total - sum(stages.values()) - sum(ex.values()), 3)

            rec = {
                "rep": rep,
                "full_seconds": full_s,
                "full_stages": res.stage_seconds,
                "full_extra": {k: round(v, 3) for k, v in full_extra.items()},
                "full_unattributed": gap(full_s, res.stage_seconds, full_extra),
                "incr_seconds": incr_s,
                "incr_stages": res_i.stage_seconds,
                "incr_extra": {k: round(v, 3) for k, v in incr_extra.items()},
                "incr_unattributed": gap(incr_s, res_i.stage_seconds, incr_extra),
                "incr_store_commits": res_i.store_commits,
            }
            results.append(rec)
            print(json.dumps(rec, default=str))
    finally:
        IDRPipeline.preflight = orig_preflight
        IDRPipeline._record_history = orig_history
        shutil.rmtree(tmp, ignore_errors=True)
    best = min(results, key=lambda r: r["full_seconds"] + r["incr_seconds"])
    print(json.dumps({"metric": "bench_extra_best", "full": best["full_seconds"],
                      "incr": best["incr_seconds"], "n_conversations": n_conversations,
                      "cpus": int(CPUS)}))


if __name__ == "__main__":
    convs = 4000
    reps = 2
    if "--convs" in sys.argv:
        convs = int(sys.argv[sys.argv.index("--convs") + 1])
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    main(convs, reps)
