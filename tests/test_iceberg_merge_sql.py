"""Golden-string pins for the Iceberg MERGE statements the catalog emulation
stands in for (VERDICT r5 #8): the emitted SQL is the real deployment path
(spark-submit with iceberg-spark-runtime), so it must not drift from the
emulated semantics. One pin per sink shape the pipeline uses."""

from sql_identity_resolution_spark.sources.catalog import iceberg_merge_sql


def test_edge_merge_sql_golden():
    # S5 edge sink: match on the edge identity, refresh last_seen_ts only
    got = iceberg_merge_sql(
        "warehouse.idr.identity_edges_current",
        "edges_new_v",
        keys=[
            "rule_id", "left_entity_key", "right_entity_key",
            "identifier_type", "identifier_value_norm",
        ],
        update_cols=["last_seen_ts"],
    )
    assert got == (
        "MERGE INTO warehouse.idr.identity_edges_current t USING edges_new_v s "
        "ON t.rule_id = s.rule_id AND t.left_entity_key = s.left_entity_key "
        "AND t.right_entity_key = s.right_entity_key "
        "AND t.identifier_type = s.identifier_type "
        "AND t.identifier_value_norm = s.identifier_value_norm "
        "WHEN MATCHED THEN UPDATE SET t.last_seen_ts = s.last_seen_ts "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_membership_merge_sql_golden():
    # S6 membership sink: full-row upsert on entity_key
    got = iceberg_merge_sql(
        "warehouse.idr.identity_resolved_membership_current",
        "membership_updates_v",
        keys=["entity_key"],
        update_cols=["resolved_id", "updated_ts"],
    )
    assert got == (
        "MERGE INTO warehouse.idr.identity_resolved_membership_current t "
        "USING membership_updates_v s ON t.entity_key = s.entity_key "
        "WHEN MATCHED THEN UPDATE SET t.resolved_id = s.resolved_id, "
        "t.updated_ts = s.updated_ts "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_run_state_merge_sql_golden():
    # S9 run_state sink: watermark advance keyed by table_id
    got = iceberg_merge_sql(
        "warehouse.idr.run_state",
        "wm_updates_v",
        keys=["table_id"],
        update_cols=["last_watermark_value", "last_run_id", "last_run_ts"],
    )
    assert got == (
        "MERGE INTO warehouse.idr.run_state t USING wm_updates_v s "
        "ON t.table_id = s.table_id "
        "WHEN MATCHED THEN UPDATE SET "
        "t.last_watermark_value = s.last_watermark_value, "
        "t.last_run_id = s.last_run_id, t.last_run_ts = s.last_run_ts "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_clusters_merge_sql_golden():
    # S7 clusters sink: delete+insert ≙ full-row update on resolved_id
    got = iceberg_merge_sql(
        "warehouse.idr.identity_clusters_current",
        "cluster_confidence_v",
        keys=["resolved_id"],
        update_cols=[
            "cluster_size", "edge_diversity", "match_density",
            "confidence_score", "primary_reason", "updated_ts",
        ],
    )
    assert got.startswith(
        "MERGE INTO warehouse.idr.identity_clusters_current t "
        "USING cluster_confidence_v s ON t.resolved_id = s.resolved_id "
        "WHEN MATCHED THEN UPDATE SET t.cluster_size = s.cluster_size"
    )
    assert got.endswith("WHEN NOT MATCHED THEN INSERT *")
