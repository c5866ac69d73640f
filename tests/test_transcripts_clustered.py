"""conversation_signatures_clustered must be BIT-identical to the shuffle-based
JVM path on a conv_id-clustered layout, and validate_clustered_layout must
detect layouts that break the contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_identity_resolution_spark.sources.datagen_spark import generate_transcripts_spark
from sql_identity_resolution_spark.sources.transcripts import (
    conversation_signatures,
    conversation_signatures_clustered,
    validate_clustered_layout,
)


def _clustered_write(spark, tmp_path, n=400):
    turns = generate_transcripts_spark(spark, n_conversations=n, seed=7).drop("truth_cluster_id")
    path = str(tmp_path / "turns_clustered")
    turns.repartition(4, "conv_id").sortWithinPartitions("conv_id", "turn_idx").write.parquet(path)
    return path


def test_clustered_layout_validates(spark, tmp_path):
    path = _clustered_write(spark, tmp_path)
    assert validate_clustered_layout(spark.read.parquet(path))


def test_interleaved_layout_rejected(spark, tmp_path):
    turns = generate_transcripts_spark(spark, n_conversations=200, seed=7).drop("truth_cluster_id")
    path = str(tmp_path / "turns_interleaved")
    # round-robin repartition scatters a conversation's turns across files
    turns.repartition(8).write.parquet(path)
    assert not validate_clustered_layout(spark.read.parquet(path))


def test_clustered_signatures_bit_identical(spark, tmp_path):
    path = _clustered_write(spark, tmp_path)
    turns = spark.read.parquet(path)
    base = conversation_signatures(turns, num_perm=32, bands=8)
    fast = conversation_signatures_clustered(turns, num_perm=32, bands=8, out_chunk=50)
    # nullability flags differ (mapInPandas output is nullable); names+types must match
    assert [(f.name, f.dataType) for f in fast.schema] == [
        (f.name, f.dataType) for f in base.schema
    ]

    def rows(df):
        return {
            r["conv_id"]: (
                r["last_ts"], r["n_turns"], r["sig_role_tool"], r["sig_first_text"],
                r["match_text"], r["sig_full_text"], tuple(r["lsh_bands"]),
            )
            for r in df.collect()
        }

    b, f = rows(base), rows(fast)
    assert set(b) == set(f)
    mismatches = {k for k in b if b[k] != f[k]}
    assert not mismatches, {k: (b[k], f[k]) for k in list(mismatches)[:3]}


def test_clustered_plan_has_no_exchange(spark, tmp_path):
    """The whole point: the clustered build's physical plan contains no
    shuffle exchange (the standard path's groupBy necessarily does)."""
    path = _clustered_write(spark, tmp_path)
    turns = spark.read.parquet(path)
    plan = conversation_signatures_clustered(turns)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    base_plan = conversation_signatures(turns)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in base_plan  # sanity: the comparison is meaningful
