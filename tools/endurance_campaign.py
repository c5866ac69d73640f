"""Chained-INCR endurance (VERDICT r5 #4): one FULL build then N consecutive
INCR micro-batches on the same warehouse, recording per-batch wall seconds,
stage seconds, per-table LIVE PART counts and unreconciled-bucket counts —
the evidence that MoR part accumulation + read-side reconciliation stays flat
(or compaction-sawtooth-bounded) instead of creeping.

Usage:
  python tools/endurance_campaign.py [--convs 100000] [--batches 20] \
      [--delta 100] [--out campaigns_r6/endurance_100k.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _part_stats(cat, name: str) -> dict:
    meta = cat._pointer(name)
    if meta is None:
        return {}
    if meta.get("buckets") is not None:
        parts = sum(len(cat._bucket_versions(v)) for v in meta["buckets"].values())
        return {
            "live_parts": parts,
            "buckets": len(meta["buckets"]),
            "upd_buckets": len(meta.get("upd") or {}),
            "unrec_buckets": len(meta.get("unrec") or []),
        }
    return {"live_parts": len(meta.get("parts") or [meta.get("version")])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--delta", type=int, default=100)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sql_identity_resolution_spark import EngineConfig, IDRPipeline
    from sql_identity_resolution_spark.session import build_session
    from sql_identity_resolution_spark.sources.datagen_spark import generate_transcripts_spark
    from sql_identity_resolution_spark.sources.transcripts import (
        transcripts_attributes,
        transcripts_source,
    )

    spark = build_session(app_name="idr-endurance", master=f"local[{args.cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(args.cpus * 2, 64)))

    work = tempfile.mkdtemp(prefix="idr_endurance_")
    turns_path = os.path.join(work, "turns")
    tracked = [
        "identity_edges_current", "identity_resolved_membership_current",
        "identity_clusters_current", "golden_profile_current",
        "identifiers_current", "entity_texts_current", "entity_attributes_current",
    ]
    out: dict = {"n_conversations": args.convs, "delta_conversations": args.delta,
                 "batches": []}
    try:
        base = generate_transcripts_spark(spark, n_conversations=args.convs, seed=42).drop(
            "truth_cluster_id"
        )
        base.repartition(64, "conv_id").sortWithinPartitions("conv_id", "turn_idx").write.parquet(
            turns_path
        )
        source, rules, mappings = transcripts_source("chat", turns_path)
        cfg = EngineConfig(
            warehouse=os.path.join(work, "wh"), sources=[source], rules=rules,
            mappings=mappings, emit_duplicate_text_pairs=False,
            attributes=transcripts_attributes("chat"),
            catalog_table_buckets={t: 1024 for t in ("identifiers_current", "entity_texts_current")},
        )
        pipe = IDRPipeline(spark, cfg)
        t0 = time.time()
        res_f = pipe.run("FULL")
        out["full_seconds"] = round(time.time() - t0, 3)
        out["full_stage_seconds"] = res_f.stage_seconds
        out["edges"] = res_f.edges_created

        for i in range(args.batches):
            # alternate chained (links into existing clusters via shared
            # vocabulary) and new-entity (disjoint) deltas — the two INCR
            # shapes — so accumulation covers both commit kinds
            chained = i % 2 == 0
            delta = (
                generate_transcripts_spark(
                    spark, n_conversations=args.delta, seed=100 + i,
                    token_tag="" if chained else f"zz{i}",
                )
                .drop("truth_cluster_id")
                .withColumn("conv_id", F.concat(F.lit(f"b{i}_"), F.col("conv_id")))
                .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {370 + i} DAYS"))
            )
            delta.coalesce(2).write.mode("append").parquet(turns_path)
            t0 = time.time()
            res_i = pipe.run("INCR")
            sec = round(time.time() - t0, 3)
            out["batches"].append({
                "batch": i,
                "kind": "chained" if chained else "new_entity",
                "incr_seconds": sec,
                "edges_created": res_i.edges_created,
                "entities_processed": res_i.entities_processed,
                "cc_path": res_i.cc_path,
                "stage_seconds": res_i.stage_seconds,
                "parts": {t: _part_stats(pipe.catalog, t) for t in tracked},
            })
            print(json.dumps(out["batches"][-1]["parts"]
                             | {"batch": i, "incr_seconds": sec}), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    doc = json.dumps(out)
    print(doc)
    if args.out:
        path = os.path.join(REPO, args.out)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(doc + "\n")


if __name__ == "__main__":
    main()
