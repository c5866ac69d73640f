"""Stage 42: cluster confidence scoring.

Reference: ``sql/common/42_compute_cluster_confidence.sql`` — the 50/35/15
formula. The reference joins membership×edges with an OR-disjunction
(``e.left=m.key OR e.right=m.key``) which Spark would execute as a
nested-loop join; we rewrite it as a UNION ALL of two equi-joins
(semantics-identical: each (membership row, edge) pair matches at most once
per side; a self-edge can't exist since left≠right by construction), as
flagged in SURVEY §4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_edge_stats(
    membership: DataFrame, edges: DataFrame, impacted_ids: DataFrame | None
) -> DataFrame:
    """COUNT(DISTINCT identifier_type), COUNT(*) per impacted resolved_id over
    edges incident to any member (sql/common/42:14-24), OR-join rewritten.

    ``impacted_ids=None`` ⇒ all clusters impacted (FULL mode): skip the
    identity semi-join (see membership.cluster_sizes)."""
    m = membership
    if impacted_ids is not None:
        m = m.join(impacted_ids, "resolved_id", "left_semi")
    m = m.select("resolved_id", "entity_key")
    # one row per (edge, endpoint) via explode — ONE scan of the edge table
    # instead of two (the union-of-equi-joins form scanned it once per side;
    # at 9.46M edges that was the INCR membership stage's largest IO term).
    # Identical semantics: each (membership row, edge) pair still matches at
    # most once per side, and left≠right by construction rules out a
    # double-counted self-edge.
    e = edges.select(
        F.explode(F.array("left_entity_key", "right_entity_key")).alias("entity_key"),
        "identifier_type",
    )
    return (
        m.join(e, "entity_key", "inner")
        .groupBy("resolved_id")
        .agg(
            F.countDistinct("identifier_type").alias("edge_diversity"),
            F.count(F.lit(1)).alias("edge_count"),
        )
    )


def cluster_confidence(
    sizes: DataFrame, edge_stats: DataFrame, run_ts, return_count: bool = False
):
    """confidence = 0.5·(diversity/max_div) + 0.35·density + 0.15, ROUND 3;
    singletons = 1.0 with reason SINGLETON_NO_MATCH_REQUIRED
    (sql/common/42:29-96). density = edge_count/(n−1) capped at 1 (star
    topology max). The global max_diversity scalar becomes a crossJoin of a
    1-row agg, mirroring the reference's CROSS JOIN (sql/common/42:80)."""
    density = sizes.join(edge_stats, "resolved_id", "left").select(
        "resolved_id",
        "cluster_size",
        F.coalesce("edge_diversity", F.lit(0)).alias("edge_diversity"),
        F.coalesce("edge_count", F.lit(0)).alias("edge_count"),
        F.when(F.col("cluster_size") <= 1, F.lit(1.0))
        .otherwise(
            F.least(
                F.lit(1.0),
                F.coalesce("edge_count", F.lit(0)).cast("double")
                / (F.col("cluster_size").cast("double") - F.lit(1.0)),
            )
        )
        .alias("match_density"),
    )
    # global max_diversity scalar: the reference CROSS JOINs a 1-row agg
    # (sql/common/42:80). A literal from a 1-row collect is semantically
    # identical and sturdier: the crossJoin form references ``density`` twice
    # (agg + probe side), and with AQE + bucketed-table scans the reused
    # exchange can coalesce to different partition counts on each reference
    # (observed "Can't zip RDDs with unequal numbers of partitions" on
    # Spark 4.1.2 with 256-bucket inputs). One 1-row driver round-trip per
    # run — same class as the run_state read. ``density`` (one row per
    # impacted cluster) is checkpointed FIRST with the max folded into the
    # same job via an Observation: without it the scalar agg and the
    # downstream consumer would each execute the full membership×edges DAG —
    # the whole upstream ran twice per run.
    from uuid import uuid4

    from pyspark.sql import Observation

    obs = Observation(f"max_div_{uuid4().hex[:8]}")
    density = density.observe(
        obs, F.max("edge_diversity").alias("m"), F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    md = max(int(obs.get["m"] or 0), 1)
    n_rows = int(obs.get["n"] or 0)
    cd = density.withColumn("max_div", F.lit(int(md)))
    out = cd.select(
        "resolved_id",
        "cluster_size",
        "edge_diversity",
        "match_density",
        F.when(F.col("cluster_size") == 1, F.lit(1.0))
        .otherwise(
            F.round(
                F.lit(0.50) * (F.col("edge_diversity").cast("double") / F.col("max_div"))
                + F.lit(0.35) * F.col("match_density")
                + F.lit(0.15),
                3,
            )
        )
        .alias("confidence_score"),
        F.when(F.col("cluster_size") == 1, F.lit("SINGLETON_NO_MATCH_REQUIRED"))
        .when(
            (F.col("edge_diversity") >= 3) & (F.col("match_density") >= 0.8),
            F.concat(F.col("edge_diversity").cast("string"), F.lit(" identifier types, high density")),
        )
        .when(
            (F.col("edge_diversity") >= 2) & (F.col("match_density") >= 0.5),
            F.concat(F.col("edge_diversity").cast("string"), F.lit(" identifier types, moderate density")),
        )
        .when(
            (F.col("edge_diversity") == 1) & (F.col("match_density") >= 0.8),
            F.lit("Single identifier type, high density"),
        )
        .when(
            (F.col("edge_diversity") == 1) & (F.col("match_density") < 0.5),
            F.lit("Single identifier type, chain pattern"),
        )
        .otherwise(
            F.concat(
                F.col("edge_diversity").cast("string"),
                F.lit(" identifier type(s), "),
                F.when(F.col("match_density") >= 0.5, "moderate").otherwise("low"),
                F.lit(" density"),
            )
        )
        .alias("primary_reason"),
        F.lit(run_ts).cast("timestamp").alias("updated_ts"),
    )
    if return_count:
        # rows map 1:1 onto the checkpointed density frame, so the count
        # rode its Observation — callers skip a second materialize+count
        # (the final projection recomputes narrowly over the checkpoint)
        return out, n_rows
    return out
