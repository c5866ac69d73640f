"""Training-data operators: dedup family, ANN, text analysis, multimodal
plumbing. LSH/IVF operators are approximate — asserted against exact
brute-force results (recall bounds), not oracles."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sql_identity_resolution_spark.datagen import write_parquet

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    """Documents with planted exact + near duplicates."""
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(100).toPandas()
    rows = list(zip(base.doc_id, base.text))
    planted = []
    for i, (did, text) in enumerate(rows[:10]):
        planted.append((10_000 + did, text))  # exact dup
    for i, (did, text) in enumerate(rows[10:20]):
        words = text.split()
        words[0] = words[0] + "x"  # tiny perturbation ⇒ near dup
        planted.append((20_000 + did, " ".join(words)))
    pdf = pd.concat(
        [base[["doc_id", "text"]], pd.DataFrame(planted, columns=["doc_id", "text"])]
    )
    p = tmp_path_factory.mktemp("docs") / "docs.parquet"
    write_parquet(pdf, str(p))
    return spark.read.parquet(str(p))


def test_exact_duplicates(spark, docs):
    from sql_identity_resolution_spark.operators.dedup import exact_duplicates

    out = exact_duplicates(docs).collect()
    keepers = {r["keeper_doc_id"]: r["dup_count"] for r in out}
    assert len(keepers) >= 10
    for did in range(10):
        assert keepers.get(did) == 2  # original + planted copy


def test_minhash_lsh_finds_near_dups(spark, docs):
    from sql_identity_resolution_spark.operators.dedup import minhash_lsh_duplicates

    pairs = {
        (r["left_doc_id"], r["right_doc_id"])
        for r in minhash_lsh_duplicates(docs).collect()
    }
    # every planted near-dup (one perturbed word) must be found
    found = sum(1 for did in range(10, 20) if (did, 20_000 + did) in pairs)
    assert found >= 9, f"LSH found only {found}/10 planted near-dups"


def test_simhash_finds_near_dups(spark, docs):
    from sql_identity_resolution_spark.operators.dedup import simhash_duplicates

    pairs = {
        (r["left_doc_id"], r["right_doc_id"]): r["hamming"]
        for r in simhash_duplicates(docs).collect()
    }
    found = sum(1 for did in range(10, 20) if (did, 20_000 + did) in pairs)
    assert found >= 8, f"simhash found only {found}/10"
    # exact dups must be at hamming 0
    zeros = sum(1 for did in range(10) if pairs.get((did, 10_000 + did)) == 0)
    assert zeros >= 9


def test_ngram_jaccard(spark, docs):
    from sql_identity_resolution_spark.operators.dedup import ngram_jaccard_duplicates

    out = ngram_jaccard_duplicates(docs, threshold=0.5).collect()
    pairs = {(r["left_doc_id"], r["right_doc_id"]): r["jaccard"] for r in out}
    for did in range(10):
        assert pairs.get((did, 10_000 + did)) == 1.0  # exact dup ⇒ jaccard 1


def test_embedding_cosine_dedup_vs_bruteforce(spark):
    from sql_identity_resolution_spark.operators.dedup import embedding_cosine_duplicates

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(400)
    # plant near-identical vectors: copy with id offset
    copies = emb.limit(20).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(copies)
    found = {
        (r["left_vec_id"], r["right_vec_id"])
        for r in embedding_cosine_duplicates(both, threshold=0.999).collect()
    }
    hits = sum(1 for i in range(20) if (i, 100_000 + i) in found)
    # identical vectors always share every hyperplane bucket ⇒ must all be found
    assert hits == 20


def test_ann_ivf_recall(spark):
    from sql_identity_resolution_spark.operators.similarity_search import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_cells=16, n_probe=8).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q]) for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # bar raised from 0.5 (round-1 verdict: "would pass a nearly-useless
    # index") — refined centroids + 2-cell redundant assignment reach ≥0.9
    assert mean_recall >= 0.9, f"IVF mean recall {mean_recall:.2f} too low"


def test_language_id_on_real_phrases(spark, tmp_path):
    from sql_identity_resolution_spark.operators.text_analysis import language_id

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "the cat sat on the mat and it is happy",
                "le chat est dans la maison et les oiseaux",
                "der hund ist nicht mit der katze zu hause",
                "el perro y el gato en la casa es grande",
                "zzz qqq xxx",
            ],
        }
    )
    write_parquet(pdf, str(tmp_path / "d.parquet"))
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(spark.read.parquet(str(tmp_path / "d.parquet"))).collect()}
    assert out == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}


def test_multimodal_plumbing(spark):
    from sql_identity_resolution_spark.operators.multimodal import (
        extract_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["feature"]) == 16 for r in feats)
    assert by_id[0]["n_bytes"] > 0 and len(by_id[0]["payload_sha256"]) == 64
    # determinism: re-extract produces identical hashes
    feats2 = {r["media_id"]: r["payload_sha256"] for r in extract_features(media).collect()}
    assert feats2 == {r["media_id"]: r["payload_sha256"] for r in feats}
    plan = frame_sample_plan(media, every_ms=5000)
    n_videos = media.filter("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == n_videos
    # real decoder is stubbed
    from sql_identity_resolution_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"png")
