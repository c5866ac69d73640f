"""Reference-parity retail corpus: generator shape + EXACT-only pipeline run.

The 10M-row campaign (bench.py --retail) is the BASELINE.md comparable; these
tests pin the generator's statistical contract at toy scale so the big run is
trustworthy: deterministic output, reference cluster-size mix, identifier
sharing only within truth clusters, and the pipeline recovering the
connected components the shared identifiers imply.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from sql_identity_resolution_spark import EngineConfig, IDRPipeline
from sql_identity_resolution_spark.sources.datagen_retail import (
    generate_retail_spark,
    retail_source,
)

N = 3000


@pytest.fixture(scope="module")
def retail(spark):
    df = generate_retail_spark(spark, N, seed=42).cache()
    df.count()
    return df


def test_deterministic(spark, retail):
    again = generate_retail_spark(spark, N, seed=42)
    assert retail.exceptAll(again).count() == 0
    assert again.exceptAll(retail).count() == 0


def test_shape(retail):
    n = retail.count()
    assert abs(n - N) / N < 0.25  # hash-sampled sizes; expectation = N
    # singleton share ≈ 35% of ENTITIES (entity-weighted buckets)
    sizes = retail.groupBy("truth_cluster_id").count()
    singleton_rows = sizes.filter(F.col("count") == 1).count()
    assert 0.25 < singleton_rows / n < 0.45
    # every record id unique; email/phone always present, loyalty ~95%
    assert retail.select("customer_record_id").distinct().count() == n
    assert retail.filter(F.col("email").isNull() | F.col("phone").isNull()).count() == 0
    assert retail.filter(F.col("loyalty_id").isNotNull()).count() / n > 0.8


def test_sharing_only_within_truth_clusters(retail):
    # an email shared by two records implies same truth cluster (uid embeds
    # the cluster id) — the corpus never links across truth clusters
    cross = (
        retail.groupBy("email")
        .agg(F.countDistinct("truth_cluster_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert cross == 0
    # and sharing does happen (share_email=55% of multi-clusters, p=0.7)
    shared = retail.groupBy("email").count().filter(F.col("count") > 1).count()
    assert shared > 0


def test_pipeline_recovers_identifier_components(spark, retail):
    tmp = tempfile.mkdtemp(prefix="idr_retail_t_")
    path = f"{tmp}/customers"
    retail.drop("truth_cluster_id").write.parquet(path)
    source, rules, mappings = retail_source("retail", path)
    cfg = EngineConfig(warehouse=f"{tmp}/wh", sources=[source], rules=rules, mappings=mappings)
    pipe = IDRPipeline(spark, cfg)
    res = pipe.run("FULL")
    assert res.status == "SUCCESS"
    mem = pipe.catalog.read("identity_resolved_membership_current")
    n = retail.count()
    assert mem.count() == n
    # records sharing an email MUST resolve together (EXACT rule, no caps hit
    # at this scale)
    pairs = (
        retail.alias("a")
        .join(retail.alias("b"), "email")
        .filter(F.col("a.customer_record_id") < F.col("b.customer_record_id"))
        .select(
            F.col("a.customer_record_id").alias("ka"),
            F.col("b.customer_record_id").alias("kb"),
        )
    )
    ma = mem.select(F.col("entity_key").alias("ka"), F.col("resolved_id").alias("ra"))
    mb = mem.select(F.col("entity_key").alias("kb"), F.col("resolved_id").alias("rb"))
    split = pairs.join(ma, "ka").join(mb, "kb").filter(F.col("ra") != F.col("rb")).count()
    assert split == 0
    # resolved clusters never span truth clusters (no false merges: corpus
    # shares identifiers only within truth clusters)
    truth = retail.select("customer_record_id", "truth_cluster_id")
    merged = (
        mem.join(truth, mem.entity_key == truth.customer_record_id)
        .groupBy("resolved_id")
        .agg(F.countDistinct("truth_cluster_id").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert merged == 0
