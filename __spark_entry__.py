"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (connected components over the derived
identity graph) at sf0.001. ``queries()`` — one DataFrame callable per
implemented operator class from SURVEY.md §2 (see
``sql_identity_resolution_spark/plans/testdata_queries.py``). ``oracle_sql()``
— the matching DuckDB-runnable ANSI SQL per query (same aliases; the driver
hash-compares values on name-sorted columns).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_identity_resolution_spark.plans.testdata_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: iterative min-label connected components (the reference's
    core operator, sql/common/31_label_propagation_step.sql) over the identity
    graph derived from sf0.001 customers."""
    return QUERIES["connected_components"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
