"""Metrics export — ≙ the reference's exporter plugins
(``tools/metrics_exporter.py:103-210``: stdout / Prometheus textfile / webhook
payload shapes) reading the ``metrics_export`` table."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sql_identity_resolution_spark.sources.catalog import Catalog


def export_stdout(catalog: Catalog, run_id: str | None = None) -> list[dict]:
    df = catalog.read("metrics_export")
    if run_id:
        df = df.filter(F.col("run_id") == run_id)
    rows = [r.asDict() for r in df.collect()]
    for r in rows:
        r["exported_at"] = str(r.get("exported_at"))
        print(json.dumps(r))
    return rows


def export_prometheus(catalog: Catalog, run_id: str | None = None) -> str:
    """Prometheus textfile-collector format (one gauge/counter per metric,
    labeled by run_id) — tools/metrics_exporter.py Prometheus plugin parity."""
    df = catalog.read("metrics_export")
    if run_id:
        df = df.filter(F.col("run_id") == run_id)
    lines = []
    for r in df.collect():
        name = r["metric_name"]
        lines.append(f"# TYPE {name} {r['metric_type']}")
        lines.append(f'{name}{{run_id="{r["run_id"]}"}} {r["metric_value"]}')
    return "\n".join(lines) + "\n"


def monitoring_views(catalog: Catalog) -> dict:
    """≙ sql/common/monitoring_views.sql: cluster-size distribution, recent
    runs, stage timings — returned as DataFrames (saved queries)."""
    clusters = catalog.read("identity_clusters_current")
    size_dist = (
        clusters.groupBy(
            F.when(F.col("cluster_size") == 1, "singleton")
            .when(F.col("cluster_size") == 2, "pair")
            .when(F.col("cluster_size") <= 5, "small_3_5")
            .when(F.col("cluster_size") <= 15, "medium_6_15")
            .when(F.col("cluster_size") <= 50, "large_16_50")
            .otherwise("huge_50_plus")
            .alias("size_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("cluster_size").alias("n_entities"),
            F.round(F.avg("confidence_score"), 3).alias("avg_confidence"),
        )
        .orderBy("size_bucket")
    )
    runs = catalog.read("run_history").orderBy(F.desc("started_at")).limit(20)
    stages = (
        catalog.read("stage_metrics")
        .groupBy("stage")
        .agg(
            F.round(F.avg("seconds"), 3).alias("avg_seconds"),
            F.max("seconds").alias("max_seconds"),
            F.count(F.lit(1)).alias("n_runs"),
        )
    )
    return {"cluster_size_distribution": size_dist, "recent_runs": runs, "stage_timings": stages}
