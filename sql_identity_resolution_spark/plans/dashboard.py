"""Static HTML dashboard — ≙ the reference's ``tools/dashboard/generator.py``
(Makefile:164): renders the monitoring views (cluster-size distribution,
recent runs, stage timings, identifier quality) into one self-contained page.
No external assets; reads only the catalog's observability tables."""

from __future__ import annotations

import html
from datetime import datetime, timezone

from sql_identity_resolution_spark.plans.exporter import monitoring_views
from sql_identity_resolution_spark.sources.catalog import Catalog

_STYLE = """
body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a2e}
h1{font-size:1.4rem} h2{font-size:1.1rem;margin-top:2rem}
table{border-collapse:collapse;margin-top:.5rem}
th,td{border:1px solid #cbd5e1;padding:.3rem .7rem;font-size:.85rem;text-align:left}
th{background:#eef2f7} .num{text-align:right;font-variant-numeric:tabular-nums}
"""


def _table(rows: list[dict], columns: list[str]) -> str:
    head = "".join(f"<th>{html.escape(c)}</th>" for c in columns)
    body = []
    for r in rows:
        cells = []
        for c in columns:
            v = r.get(c)
            cls = ' class="num"' if isinstance(v, (int, float)) else ""
            cells.append(f"<td{cls}>{html.escape(str(v)) if v is not None else ''}</td>")
        body.append("<tr>" + "".join(cells) + "</tr>")
    return f"<table><tr>{head}</tr>{''.join(body)}</table>"


def generate_dashboard(catalog: Catalog, out_path: str) -> str:
    views = monitoring_views(catalog)
    sections = []
    for title, df in [
        ("Cluster size distribution", views["cluster_size_distribution"]),
        ("Recent runs", views["recent_runs"]),
        ("Stage timings", views["stage_timings"]),
    ]:
        rows = [r.asDict() for r in df.collect()]
        cols = df.columns
        sections.append(f"<h2>{html.escape(title)}</h2>{_table(rows, cols)}")
    if catalog.exists("identifier_quality"):
        iq = catalog.read("identifier_quality")
        sections.append(
            "<h2>Identifier quality</h2>" + _table([r.asDict() for r in iq.collect()], iq.columns)
        )
    now = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    page = (
        f"<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>IDR dashboard</title><style>{_STYLE}</style></head><body>"
        f"<h1>Identity-resolution dashboard</h1><p>generated {now}</p>"
        f"{''.join(sections)}</body></html>"
    )
    with open(out_path, "w") as f:
        f.write(page)
    return out_path
