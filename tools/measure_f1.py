"""Measure and print the BASELINE gate numbers: pairwise precision/recall/F1
of the full pipeline against generator ground truth, on a fresh fixture.

Usage: python tools/measure_f1.py [n_conversations] [seed] [--fuzzy-only]
Prints one JSON line; exits non-zero if F1 < 0.99.

``--fuzzy-only`` (VERDICT r5 #7): deactivates every EXACT rule so LSH
blocking + threshold scoring is the ONLY path to an edge — the number then
measures blocking recall and the scorer threshold, not exact-key lookup.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    fuzzy_only = "--fuzzy-only" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 5000
    seed = int(args[1]) if len(args) > 1 else 42

    from pyspark.sql import functions as F

    from sql_identity_resolution_spark import EngineConfig, IDRPipeline
    from sql_identity_resolution_spark.plans.evaluate import pairwise_f1
    from sql_identity_resolution_spark.session import build_session
    from sql_identity_resolution_spark.sources.datagen_spark import generate_transcripts_spark
    from sql_identity_resolution_spark.sources.transcripts import transcripts_source

    # ≥2 reduce tasks per core once the corpus leaves toy scale (same sizing
    # rule as bench.py's econ/retail sections); F1 math itself is fully
    # distributed (pair counts derived arithmetically from group sizes —
    # plans/evaluate.pairwise_f1), so NO sampling is needed at 100k+.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = build_session(
        app_name="idr-f1",
        master=f"local[{cpus}]",
        shuffle_partitions=(max(64, cpus * 2) if n >= 50_000 else None),
    )
    with tempfile.TemporaryDirectory(prefix="idr_f1_") as tmp:
        turns_path = os.path.join(tmp, "turns")
        gen = generate_transcripts_spark(spark, n_conversations=n, seed=seed)
        truth_path = os.path.join(tmp, "truth")
        gen.select("conv_id", "truth_cluster_id").distinct().write.parquet(truth_path)
        gen.drop("truth_cluster_id").write.mode("overwrite").parquet(turns_path)
        truth = spark.read.parquet(truth_path)

        source, rules, mappings = transcripts_source("chat", turns_path)
        if fuzzy_only:
            for r in rules:
                if r.match_strategy != "SCORED":
                    r.is_active = False
        cfg = EngineConfig(
            warehouse=os.path.join(tmp, "wh"), sources=[source], rules=rules, mappings=mappings
        )
        pipe = IDRPipeline(spark, cfg)
        res = pipe.run("FULL")
        membership = pipe.catalog.read("identity_resolved_membership_current").select(
            F.regexp_replace("entity_key", "^chat:", "").alias("conv_id"), "resolved_id"
        )
        scores = pairwise_f1(membership, truth, key="conv_id")
        out = {
            "metric": "pairwise_f1",
            "n_conversations": n,
            "seed": seed,
            "precision": round(scores.precision, 6),
            "recall": round(scores.recall, 6),
            "f1": round(scores.f1, 6),
            "lp_iterations": res.lp_iterations,
            "edges": res.edges_created,
        }
        print(json.dumps(out))
    spark.stop()
    sys.exit(0 if out["f1"] >= 0.99 else 1)


if __name__ == "__main__":
    main()
