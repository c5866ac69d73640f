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
