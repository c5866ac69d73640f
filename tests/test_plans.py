"""Physical-plan regression tests: the properties that matter at 100 TB
(pushdown, pruning, broadcast of dimensions, no driver broadcast in the CC
loop) asserted on the actual Catalyst output, not by eyeball."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_identity_resolution_spark.plans.testdata_queries import QUERIES

SF = "/root/testdata/sf0.01"


def formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_watermark_scan_pushdown_and_pruning(spark):
    plan = formatted_plan(QUERIES["watermark_delta_scan"](spark, SF))
    assert "GreaterThanOrEqual(ts," in plan, "watermark predicate not pushed to parquet"
    # projection pruned to exactly the referenced columns
    assert "props" not in plan and "value:" not in plan, "scan reads unprojected columns"


def test_exclusion_is_broadcast_anti_join(spark):
    plan = formatted_plan(QUERIES["exclusion_anti_join"](spark, SF))
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan, "tiny exclusion list should broadcast"


def test_anchor_edges_broadcasts_group_side(spark):
    plan = formatted_plan(QUERIES["anchor_edges"](spark, SF))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_lp_iteration_uses_shuffle_hash_not_broadcast(spark):
    """The CC loop must never collect labels to the driver per iteration."""
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(100)],
        "left_entity_key string, right_entity_key string",
    )
    und = edges.select(
        F.col("left_entity_key").alias("src"), F.col("right_entity_key").alias("dst")
    )
    labels = edges.select(F.col("left_entity_key").alias("dst"), F.col("left_entity_key").alias("label"))
    joined = und.join(labels.hint("shuffle_hash"), "dst", "inner")
    plan = formatted_plan(joined)
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_members_exchange_reuse(spark):
    """group_sizes over hash-partitioned members must not add an extra
    exchange on the same key (reuse of the repartition)."""
    from sql_identity_resolution_spark.operators import blocking

    ids = QUERIES["identifier_extraction"](spark, SF).withColumnRenamed("entity_key", "entity_key")
    members = ids.select(
        "entity_key", "identifier_type", "identifier_value_norm"
    ).repartition("identifier_type", "identifier_value_norm")
    sized = members.groupBy("identifier_type", "identifier_value_norm").count()
    plan = formatted_plan(sized)
    # the groupBy must reuse the explicit repartition instead of re-shuffling
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 2, plan[:500]
