"""Stage 40/41: membership updates (+singleton fallback) and cluster sizes.

Reference: ``sql/common/40_update_membership_current.sql``,
``sql/common/41_update_clusters_current.sql`` (and the dry-run variant at
``sql/duckdb/core/idr_run.py:520-552``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def membership_updates(
    labels: DataFrame,
    entities_delta: DataFrame,
    run_ts,
    prior_members: DataFrame | None = None,
) -> DataFrame:
    """resolved_id = LP label for subgraph nodes; delta entities with no edges
    become singletons resolved to themselves (NOT IN lp_labels → left_anti,
    sql/common/40:4-18).

    ``prior_members`` (INCR only, bucket-pruned to the delta's buckets): a
    re-signed watermark-boundary entity that already HAS a membership row and
    gained no new edges must not be re-inserted as a self-singleton — its
    existing (possibly clustered) row stands. New entities are never in the
    store, so the guard only filters re-signed boundary rows."""
    ts = F.lit(run_ts).cast("timestamp")
    labeled = labels.select("entity_key", F.col("label").alias("resolved_id"), ts.alias("updated_ts"))
    singletons = (
        entities_delta.select("entity_key")
        .distinct()
        .join(labels.select("entity_key"), "entity_key", "left_anti")
    )
    if prior_members is not None:
        singletons = singletons.join(
            prior_members.select("entity_key"), "entity_key", "left_anti"
        )
    singletons = singletons.select(
        "entity_key", F.col("entity_key").alias("resolved_id"), ts.alias("updated_ts")
    )
    return labeled.unionByName(singletons)


def impacted_resolved_ids(updates: DataFrame) -> DataFrame:
    """DISTINCT resolved_id of this run's membership updates (sql/common/41:4-6)."""
    return updates.select("resolved_id").distinct()


def cluster_sizes(membership: DataFrame, impacted_ids: DataFrame | None, run_ts) -> DataFrame:
    """COUNT(*) per impacted resolved_id over the (post-merge) membership
    (sql/common/41:8-15). ``membership`` is membership_current after the MERGE
    in live mode, or membership_updates in dry-run (idr_run.py:527-541).

    ``impacted_ids=None`` ⇒ every cluster is impacted (FULL mode) — the
    restriction semi-join would be the identity, so skip its corpus-wide
    shuffle entirely."""
    m = membership
    if impacted_ids is not None:
        m = m.join(impacted_ids, "resolved_id", "left_semi")
    return (
        m.groupBy("resolved_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .withColumn("updated_ts", F.lit(run_ts).cast("timestamp"))
    )


def dry_run_diff(
    proposed: DataFrame,
    current_membership: DataFrame,
    current_clusters: DataFrame,
    proposed_clusters: DataFrame,
    entities_delta: DataFrame,
    run_id: str,
) -> DataFrame:
    """FULL OUTER join proposed×current membership → change_type
    NEW/MOVED/UNCHANGED, restricted to this run's delta entities
    (idr_run.py:705-730)."""
    p = proposed.select(
        F.col("entity_key").alias("p_key"), F.col("resolved_id").alias("proposed_resolved_id")
    )
    c = current_membership.select(
        F.col("entity_key").alias("c_key"), F.col("resolved_id").alias("current_resolved_id")
    )
    joined = p.join(c, p.p_key == c.c_key, "full_outer").select(
        F.coalesce("p_key", "c_key").alias("entity_key"),
        "current_resolved_id",
        "proposed_resolved_id",
        F.when(F.col("c_key").isNull(), "NEW")
        .when(F.col("current_resolved_id") == F.col("proposed_resolved_id"), "UNCHANGED")
        .otherwise("MOVED")
        .alias("change_type"),
    )
    joined = joined.join(entities_delta.select("entity_key").distinct(), "entity_key", "left_semi")
    cur_sizes = current_clusters.select(
        F.col("resolved_id").alias("current_resolved_id"),
        F.col("cluster_size").alias("current_cluster_size"),
    )
    prop_sizes = proposed_clusters.select(
        F.col("resolved_id").alias("proposed_resolved_id"),
        F.col("cluster_size").alias("proposed_cluster_size"),
    )
    return (
        joined.join(cur_sizes, "current_resolved_id", "left")
        .join(prop_sizes, "proposed_resolved_id", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            "entity_key",
            "current_resolved_id",
            "proposed_resolved_id",
            "change_type",
            "current_cluster_size",
            "proposed_cluster_size",
        )
    )
