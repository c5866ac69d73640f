"""Training-data deduplication operators over a documents table
(doc_id, text, ...): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup.

These generalize the engine's identity-resolution blocking machinery to
corpus dedup (same shape: blocking key → candidate pairs → verify → groups),
the standard large-scale pipeline pattern (e.g. Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL'22). All heavy lifting is
JVM-side; MinHash/SimHash signatures are Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sql_identity_resolution_spark.functions.minhash import minhash_band_keys_udf, simhash64_udf
from sql_identity_resolution_spark.functions.normalize import normalize_text


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup on normalized text: one row per duplicate
    GROUP (size ≥ 2) with the keeper (min id) and dup count. Single shuffle
    on the 256-bit content hash — never on the raw text."""
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(normalize_text(F.col(text_col)), 256).alias("content_hash")
    )
    return (
        h.groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("dup_count") >= 2)
    )


def minhash_lsh_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_block: int = 1000,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding: shingle → signature →
    band keys → ALL pairs within each bucket (self-join, left<right). Unlike
    the identity pipeline's anchor-star (where transitive clustering recovers
    the group), pairwise dedup must emit every colliding pair — a bucket where
    the anchor fails verification must not hide the other pairs. Buckets are
    small by LSH construction; ``max_block`` skips degenerate ones (≙ the
    pipeline's max_group_size guard). Returns distinct
    (left_doc_id, right_doc_id, n_shared_bands)."""
    band_udf = minhash_band_keys_udf(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    keyed = (
        docs.select(F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("t"))
        .withColumn("band_key", F.explode(band_udf(F.col("t"))))
        .select("doc_id", "band_key")
        .localCheckpoint(eager=False)
    )
    ok = keyed.groupBy("band_key").agg(F.count(F.lit(1)).alias("n")).filter(
        (F.col("n") >= 2) & (F.col("n") <= max_block)
    )
    small = keyed.join(ok.select("band_key"), "band_key", "left_semi")
    a = small.select("band_key", F.col("doc_id").alias("left_doc_id"))
    b = small.select("band_key", F.col("doc_id").alias("right_doc_id"))
    pairs = a.join(b, "band_key", "inner").filter(F.col("left_doc_id") < F.col("right_doc_id"))
    return pairs.groupBy("left_doc_id", "right_doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


def simhash_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 4,
    table_bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup: 64-bit signature, blocked on 4 rotated 16-bit chunks
    (two signatures within Hamming distance ≤ 3 must agree on ≥1 of 4 chunks —
    pigeonhole), verify pairs by exact Hamming distance via bit_count(xor).
    Returns (left_doc_id, right_doc_id, hamming)."""
    sim = simhash64_udf(shingle_k=shingle_k)
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), sim(normalize_text(F.col(text_col))).alias("sig")
    ).localCheckpoint(eager=False)
    n_chunks = 64 // table_bits
    mask = (1 << table_bits) - 1
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        (F.shiftrightunsigned("sig", i * table_bits).bitwiseAND(F.lit(mask))).cast("string"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_key"),
    )
    a = chunks.select(F.col("doc_id").alias("left_doc_id"), F.col("sig").alias("lsig"), "chunk_key")
    b = chunks.select(F.col("doc_id").alias("right_doc_id"), F.col("sig").alias("rsig"), "chunk_key")
    cand = (
        a.join(b, "chunk_key", "inner")
        .filter(F.col("left_doc_id") < F.col("right_doc_id"))
        .select("left_doc_id", "right_doc_id", "lsig", "rsig")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("lsig").bitwiseXOR(F.col("rsig"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_doc_id", "right_doc_id", "hamming")
    )


def ngram_jaccard_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_block: int = 2000,
) -> DataFrame:
    """Word n-gram Jaccard near-dup, fully JVM-side (no UDFs): explode n-grams,
    block on each document's rarest n-gram... simplified to: candidate pairs
    share ≥1 n-gram (anchored per n-gram to stay linear), then exact Jaccard
    via array_intersect/array_union on distinct n-gram arrays.

    Output: (left_doc_id, right_doc_id, jaccard) with jaccard ≥ threshold,
    rounded to 6dp for oracle comparison.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("w"),
    )
    grams = toks.select(
        "doc_id",
        F.array_distinct(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("w") - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, n)),
                ),
                lambda g: F.length(g) > 0,
            )
        ).alias("grams"),
    ).localCheckpoint(eager=False)
    exploded = grams.select("doc_id", F.explode("grams").alias("g"))
    # candidate pairs: every pair sharing a non-degenerate n-gram. To keep the
    # self-join linear, block on the pair's RAREST shared gram only would need
    # a second pass; instead cap per-gram fan-out (max_block) and dedup pairs.
    ok = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("cnt")).filter(
        (F.col("cnt") >= 2) & (F.col("cnt") <= max_block)
    )
    small = exploded.join(ok.select("g"), "g", "left_semi")
    cand = (
        small.select("g", F.col("doc_id").alias("left_doc_id"))
        .join(small.select("g", F.col("doc_id").alias("right_doc_id")), "g", "inner")
        .filter(F.col("left_doc_id") < F.col("right_doc_id"))
        .select("left_doc_id", "right_doc_id")
        .distinct()
    )
    lg = grams.select(F.col("doc_id").alias("left_doc_id"), F.col("grams").alias("lg"))
    rg = grams.select(F.col("doc_id").alias("right_doc_id"), F.col("grams").alias("rg"))
    return (
        cand.join(lg, "left_doc_id")
        .join(rg, "right_doc_id")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("lg", "rg")).cast("double")
                / F.size(F.array_union("lg", "rg")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("left_doc_id", "right_doc_id", "jaccard")
    )


def embedding_cosine_duplicates(
    vecs: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH blocking + exact cosine
    verify, all in JVM expressions (F.aggregate/F.zip_with — no Python).

    Sign-of-projection onto ``n_planes`` deterministic pseudo-random
    hyperplanes forms the bucket key; within a bucket, anchor-star candidate
    pairs get exact cosine; pairs ≥ threshold survive. Deterministic planes
    derive from a hash of (seed, plane, dim) — no RNG at plan time.
    """
    import numpy as np

    dim_df = vecs.select(F.size(vec_col).alias("d")).limit(1)
    dim = dim_df.first()["d"]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))

    def proj_sign(p):
        arr = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    bucket = F.concat(*[proj_sign(planes[i]) for i in range(n_planes)])
    keyed = vecs.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        bucket.alias("bucket"),
    ).localCheckpoint(eager=False)

    ok = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 2)
    small = keyed.join(ok.select("bucket"), "bucket", "left_semi")
    cand = (
        small.select("bucket", F.col("vid").alias("left_vec_id"))
        .join(small.select("bucket", F.col("vid").alias("right_vec_id")), "bucket", "inner")
        .filter(F.col("left_vec_id") < F.col("right_vec_id"))
        .select("left_vec_id", "right_vec_id")
        .distinct()
    )
    lv = keyed.select(F.col("vid").alias("left_vec_id"), F.col("v").alias("lv"))
    rv = keyed.select(F.col("vid").alias("right_vec_id"), F.col("v").alias("rv"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    return (
        cand.join(lv, "left_vec_id")
        .join(rv, "right_vec_id")
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("lv"), F.col("rv"))
                / (F.sqrt(dot(F.col("lv"), F.col("lv"))) * F.sqrt(dot(F.col("rv"), F.col("rv")))),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("left_vec_id", "right_vec_id", "cosine")
    )
