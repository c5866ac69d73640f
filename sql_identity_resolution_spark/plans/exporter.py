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


def _metric_dicts(catalog: Catalog, run_id: str | None) -> list[dict]:
    df = catalog.read("metrics_export")
    if run_id:
        df = df.filter(F.col("run_id") == run_id)
    rows = [r.asDict() for r in df.collect()]
    for r in rows:
        r["exported_at"] = str(r.get("exported_at"))
    return rows


def export_webhook(
    catalog: Catalog,
    url: str,
    run_id: str | None = None,
    headers: dict | None = None,
    timeout: int = 30,
    post=None,
) -> dict:
    """HTTP-push exporter ≙ the reference WebhookPlugin
    (tools/metrics_exporter.py:117-149): POST one JSON payload
    ``{timestamp, metrics_count, metrics:[...]}``. ``post`` is injectable for
    tests / custom transports; the default uses stdlib urllib (the sandbox has
    no ``requests``). Returns the payload with ``ok`` set from the transport."""
    import json as _json
    from datetime import datetime, timezone

    rows = _metric_dicts(catalog, run_id)
    payload = {
        "timestamp": datetime.now(timezone.utc).isoformat(),
        "metrics_count": len(rows),
        "metrics": rows,
    }
    if post is None:

        def post(u, body, hdrs):  # pragma: no cover - network path
            import urllib.request

            req = urllib.request.Request(
                u, data=body.encode("utf-8"), headers=hdrs or {"Content-Type": "application/json"}
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return 200 <= resp.status < 300

    try:
        ok = bool(post(url, _json.dumps(payload), headers or {"Content-Type": "application/json"}))
    except Exception as e:
        print(f"[ERROR] webhook export failed: {e}")
        ok = False
    return {**payload, "ok": ok}


def export_datadog(
    catalog: Catalog,
    api_key: str | None = None,
    run_id: str | None = None,
    post=None,
) -> dict:
    """DataDog series exporter ≙ the reference DataDogPlugin
    (tools/metrics_exporter.py:199-250): one ``{'series': [...]}`` POST with
    ``run_id:<id>`` tags, gauge/count typing from metric_type. API key from
    the argument or ``DD_API_KEY``; ``post`` injectable for tests."""
    import json as _json
    import os as _os
    import time as _time

    key = api_key or _os.environ.get("DD_API_KEY")
    if not key:
        raise ValueError("DataDog API key required: pass api_key or set DD_API_KEY")
    rows = _metric_dicts(catalog, run_id)
    now = int(_time.time())
    series = [
        {
            "metric": r["metric_name"],
            "points": [[now, r["metric_value"]]],
            "type": "gauge" if r["metric_type"] == "gauge" else "count",
            "tags": [f"run_id:{r['run_id']}"],
        }
        for r in rows
    ]
    payload = {"series": series}
    if post is None:

        def post(u, body, hdrs):  # pragma: no cover - network path
            import urllib.request

            req = urllib.request.Request(u, data=body.encode("utf-8"), headers=hdrs)
            with urllib.request.urlopen(req, timeout=30) as resp:
                return 200 <= resp.status < 300

    try:
        ok = bool(
            post(
                "https://api.datadoghq.com/api/v1/series",
                _json.dumps(payload),
                {"Content-Type": "application/json", "DD-API-KEY": key},
            )
        )
    except Exception as e:
        print(f"[ERROR] datadog export failed: {e}")
        ok = False
    return {**payload, "ok": ok}


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
