"""Parity: block-grouped cogroup scoring ≡ classic attach-arrays scoring.

The grouped path (`EngineConfig.score_grouped`) must be a pure execution-
strategy swap: same deduped pairs, bit-identical scores (both paths share the
`_int_tokens` token representation), same edges, same clusters.
"""

from __future__ import annotations

import tempfile

import pytest

from sql_identity_resolution_spark import EngineConfig, IDRPipeline
from sql_identity_resolution_spark.datagen import generate_transcripts, write_transcripts
from sql_identity_resolution_spark.sources.transcripts import transcripts_source


@pytest.fixture(scope="module")
def corpus(spark):
    gen = generate_transcripts(n_conversations=600, seed=7)
    tmp = tempfile.mkdtemp(prefix="idr_grouped_")
    paths = write_transcripts(gen, tmp)
    return paths["turns"]


def _run(spark, turns_path, grouped: bool):
    tmp = tempfile.mkdtemp(prefix=f"idr_grouped_wh_{grouped}_")
    source, rules, mappings = transcripts_source("chat", turns_path)
    cfg = EngineConfig(
        warehouse=f"{tmp}/wh", sources=[source], rules=rules, mappings=mappings,
        score_grouped=grouped,
    )
    pipe = IDRPipeline(spark, cfg)
    res = pipe.run("FULL")
    edges = {
        (r["rule_id"], r["left_entity_key"], r["right_entity_key"])
        for r in pipe.catalog.read("identity_edges_current").collect()
    }
    membership = {
        r["entity_key"]: r["resolved_id"]
        for r in pipe.catalog.read("identity_resolved_membership_current").collect()
    }
    return res, edges, membership


def test_grouped_scoring_parity(spark, corpus):
    res_c, edges_c, mem_c = _run(spark, corpus, grouped=False)
    res_g, edges_g, mem_g = _run(spark, corpus, grouped=True)
    # same pairs survived dedup and were scored
    assert res_g.candidate_pairs_scored == res_c.candidate_pairs_scored
    # identical edge sets (⊃ identical passing scores) and identical clusters
    assert edges_g == edges_c
    assert mem_g == mem_c
    assert res_g.edges_created == res_c.edges_created


def test_grouped_scoring_null_text_parity(spark):
    """Entities with NULL match_text must not crash the grouped kernel
    (frozenset(None) would raise in the executor) and must yield the same
    edges as the classic path, where the NULL score is dropped by the
    threshold filter."""
    from pyspark.sql import functions as F

    from sql_identity_resolution_spark.operators import scoring

    pairs = spark.createDataFrame(
        [
            ("r1", "a", "b", "minhash_band", "k1"),
            ("r1", "a", "n", "minhash_band", "k1"),  # right side NULL text
            ("r1", "n", "b", "minhash_band", "k1"),  # left side NULL text
            ("r1", "m", "n", "minhash_band", "k1"),  # both NULL
        ],
        "rule_id string, left_entity_key string, right_entity_key string, "
        "identifier_type string, identifier_value_norm string",
    )
    texts = spark.createDataFrame(
        [("a", "hello world foo"), ("b", "hello world bar"), ("n", None), ("m", None)],
        "entity_key string, match_text string",
    )
    meta = {"r1": (0.3, "token_jaccard")}
    classic = scoring.score_candidate_pairs(pairs, texts, rule_meta=meta)
    grouped = scoring.score_candidate_pairs_grouped(pairs, texts, rule_meta=meta)

    def passing(df):
        return {
            (r["left_entity_key"], r["right_entity_key"], r["score"])
            for r in df.filter(F.col("score") >= F.col("threshold")).collect()
        }

    got_c, got_g = passing(classic), passing(grouped)
    assert got_c == got_g
    assert got_c == {("a", "b", 0.5)}  # NULL-text pairs dropped, not crashed
