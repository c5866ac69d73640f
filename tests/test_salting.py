"""Salted block join must be output-identical to the plain join, and the full
pipeline with salt_buckets>0 must produce identical clusters."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from sql_identity_resolution_spark.config import EngineConfig, IdentifierMapping, Rule, SourceTable
from sql_identity_resolution_spark.datagen import write_parquet
from sql_identity_resolution_spark.plans.pipeline import IDRPipeline


def _rows(n=60):
    return pd.DataFrame(
        {
            "entity_id": [f"E{i:03d}" for i in range(n)],
            # one hot key shared by half the entities + distinct keys
            "loyalty_id": ["HOT"] * (n // 2) + [f"L{i}" for i in range(n // 2)],
            "updated_at": [datetime(2026, 1, 1)] * n,
        }
    )


def _run(spark, tmp_path, salt):
    src = tmp_path / f"crm_{salt}.parquet"
    write_parquet(_rows(), str(src))
    cfg = EngineConfig(
        warehouse=str(tmp_path / f"wh_{salt}"),
        sources=[SourceTable("crm", "entity_id", "updated_at", path=str(src))],
        rules=[Rule("R_L", "LOYALTY_ID")],
        mappings=[IdentifierMapping("crm", "LOYALTY_ID", "loyalty_id")],
        salt_buckets=salt,
    )
    pipe = IDRPipeline(spark, cfg)
    res = pipe.run("FULL")
    edges = {
        (r["left_entity_key"], r["right_entity_key"])
        for r in pipe.catalog.read("identity_edges_current").collect()
    }
    membership = {
        r["entity_key"]: r["resolved_id"]
        for r in pipe.catalog.read("identity_resolved_membership_current").collect()
    }
    return res, edges, membership


def test_salting_output_identical(spark, tmp_path):
    res0, edges0, m0 = _run(spark, tmp_path, 0)
    res8, edges8, m8 = _run(spark, tmp_path, 8)
    assert edges0 == edges8
    assert m0 == m8
    assert res0.edges_created == res8.edges_created == 29  # hot star: 30 members, 29 edges
