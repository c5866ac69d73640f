"""Stage 50: survivorship-based golden profile.

Reference: ``sql/common/50_build_golden_profile_incremental.sql`` — per
attribute, rank members by (trust_rank ASC, recency DESC) or recency only and
take rank 1. The reference hardcodes 4 attributes with run-time DESCRIBE
column discovery (idr_run.py:584-594); we make the attribute list explicit
metadata (AttributeMapping) and compute ALL attributes in ONE pass: a single
melt + one window per strategy group instead of one CTE + left join per
attribute (4 window scans + 4 joins → 1 scan + 1 pivot). Same rank-1
semantics, deterministic tie-breaking by entity_key.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_identity_resolution_spark.config import EngineConfig
from sql_identity_resolution_spark.operators.extract import entity_key_col

_EPOCH = "1900-01-01"  # reference null-recency sentinel (sql/common/50:41)


def build_entities_all(
    spark: SparkSession, cfg: EngineConfig, loaded: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Long-form attribute table: (entity_key, table_id, attribute_name,
    attribute_value, record_updated_at). One scan per source, attributes
    melted via an inline stack — column-pruned to exactly the referenced
    exprs."""
    loaded = loaded or {}
    parts: list[DataFrame] = []
    for st in cfg.sources:
        if not st.is_active:
            continue
        attrs = [a for a in cfg.attributes if a.table_id == st.table_id]
        if not attrs:
            continue
        src = loaded.get(st.table_id)
        if src is None:
            src = st.load(spark)
        cols = [
            F.struct(
                F.lit(a.attribute_name).alias("attribute_name"),
                F.expr(a.attribute_expr).cast("string").alias("attribute_value"),
            )
            for a in attrs
        ]
        parts.append(
            src.select(
                entity_key_col(st.table_id, st.entity_key_expr).alias("entity_key"),
                F.lit(st.table_id).alias("table_id"),
                F.col(st.watermark_column).cast("timestamp").alias("record_updated_at"),
                F.explode(F.array(*cols)).alias("attr"),
            ).select(
                "entity_key",
                "table_id",
                F.col("attr.attribute_name").alias("attribute_name"),
                F.col("attr.attribute_value").alias("attribute_value"),
                "record_updated_at",
            )
        )
    if not parts:
        return spark.createDataFrame(
            [],
            "entity_key string, table_id string, attribute_name string, "
            "attribute_value string, record_updated_at timestamp",
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


def golden_updates(
    spark: SparkSession,
    cfg: EngineConfig,
    entities_all: DataFrame,
    membership: DataFrame,
    impacted_ids: DataFrame | None,
    run_ts,
    cluster_ids: DataFrame | None = None,
) -> DataFrame:
    """Wide golden profile for impacted clusters: one row per resolved_id,
    one column per attribute_name (rank-1 surviving value).

    ``impacted_ids=None`` ⇒ every cluster is impacted (FULL mode): the member
    restriction semi-join is the identity and is skipped; ``cluster_ids``
    must then supply the one-row-per-cluster dimension (the pipeline passes
    the already-checkpointed confidence frame's ids — zero recompute)."""
    if impacted_ids is None:
        if cluster_ids is None:
            raise ValueError("golden_updates: impacted_ids=None requires cluster_ids")
        members = membership.select("resolved_id", "entity_key")
        impacted_ids = cluster_ids.select("resolved_id")
    else:
        members = membership.join(impacted_ids, "resolved_id", "left_semi").select(
            "resolved_id", "entity_key"
        )
    ent = entities_all.join(members, "entity_key", "inner")

    trust_rows = [(t.table_id, int(t.trust_rank)) for t in cfg.trust if t.is_active]
    if trust_rows:
        trust = spark.createDataFrame(trust_rows, "table_id string, trust_rank int")
        ent = ent.join(F.broadcast(trust), "table_id", "left")
    else:
        ent = ent.withColumn("trust_rank", F.lit(None).cast("int"))
    ent = ent.withColumn("trust_rank", F.coalesce("trust_rank", F.lit(9999))).withColumn(
        "ru", F.coalesce("record_updated_at", F.lit(_EPOCH).cast("timestamp"))
    )

    strategies = {a.attribute_name: a.strategy for a in cfg.attributes}
    trust_attrs = [n for n, s in strategies.items() if s == "TRUST_RECENCY"]
    recency_attrs = [n for n, s in strategies.items() if s != "TRUST_RECENCY"]

    ranked_parts = []
    base = ent.filter(F.col("attribute_value").isNotNull())
    if trust_attrs:
        w = Window.partitionBy("resolved_id", "attribute_name").orderBy(
            F.asc("trust_rank"), F.desc("ru"), F.asc("entity_key")
        )
        ranked_parts.append(
            base.filter(F.col("attribute_name").isin(trust_attrs)).withColumn(
                "rn", F.row_number().over(w)
            )
        )
    if recency_attrs:
        w = Window.partitionBy("resolved_id", "attribute_name").orderBy(
            F.desc("ru"), F.asc("entity_key")
        )
        ranked_parts.append(
            base.filter(F.col("attribute_name").isin(recency_attrs)).withColumn(
                "rn", F.row_number().over(w)
            )
        )
    if not ranked_parts:
        return impacted_ids.select(
            "resolved_id", F.lit(run_ts).cast("timestamp").alias("updated_ts")
        )
    ranked = functools.reduce(lambda a, b: a.unionByName(b), ranked_parts)
    winners = ranked.filter(F.col("rn") == 1)

    attr_names = sorted(strategies)
    wide = (
        winners.groupBy("resolved_id")
        .pivot("attribute_name", attr_names)
        .agg(F.first("attribute_value"))
    )
    return (
        impacted_ids.join(wide, "resolved_id", "left")
        .withColumn("updated_ts", F.lit(run_ts).cast("timestamp"))
    )
