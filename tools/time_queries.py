"""Time the 11 declared bench queries with the frozen bench.py methodology
(noop sink, best-of-N, CC memo cleared per rep). Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python tools/time_queries.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")

BENCH_QUERIES = [
    "identifier_extraction", "group_sizes", "anchor_edges", "connected_components",
    "cluster_sizes", "cluster_confidence", "survivorship_golden", "impacted_subgraph",
    "monitoring_rollup", "topk_heavy_identifiers", "watermark_delta_scan",
]


def main(reps: int) -> None:
    from sql_identity_resolution_spark.plans import testdata_queries as tq
    from sql_identity_resolution_spark.session import build_session

    spark = build_session(app_name="time-queries", master=f"local[{CPUS}]")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(tq.QUERIES["identifier_extraction"](spark, SF_DIR))  # warm
    out = {}
    for name in BENCH_QUERIES:
        runs = []
        for _ in range(reps):
            if name == "connected_components":
                tq._CC_LABELS_CACHE.clear()
            t0 = time.time()
            force(tq.QUERIES[name](spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        out[name] = {"best": min(runs), "runs": runs}
    print(json.dumps({"sf_dir": SF_DIR, "total_best": round(sum(v["best"] for v in out.values()), 3),
                      "queries": out}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
