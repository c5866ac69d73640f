"""Distributed synthetic transcripts generator — pure Spark expressions.

The pandas generator (``datagen.py``) is the test-fixture path; this is the
scale path: all columns derive deterministically from ``xxhash64`` of
(seed, cluster, member, turn), so a 10^8-turn corpus generates in parallel
with no Python in the loop and no RNG state. Cluster-size distribution,
match-signal mix (exact dup / paraphrase / structure-match) and ~15% chains
mirror the reference benchmark generator's knobs
(``tools/scale_test/configs/20m_standard.yaml:8-24``).

Truth labels: ``truth_cluster_id`` column (drop it for the pipeline input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOPICS = [
    "reset my password for the billing portal",
    "deploy the model to the staging cluster",
    "why does the spark job shuffle so much data",
    "book a flight from london to tokyo next week",
    "summarize the quarterly revenue report",
    "debug the null pointer in the checkout service",
    "write a poem about distributed systems",
    "migrate the database from postgres to iceberg",
    "explain the difference between left and anti joins",
    "optimize the parquet layout for point lookups",
    "set up alerts for the failed pipeline runs",
    "translate this document into french please",
]
_FILLER = [
    "sure let me look into that for you right away",
    "here is what i found after checking the relevant sources",
    "that makes sense could you also check the other case",
    "the result shows the expected values in all partitions",
    "thanks that resolved the issue completely",
    "one more thing before we finish this task",
    "i ran the command and attached the output below",
    "the metrics look healthy after the latest change",
]
_TOOLS = ["search", "python", "sql", "browser", "calculator"]


def _h(*cols) -> F.Column:
    """Deterministic non-negative hash stream."""
    return F.abs(F.xxhash64(*[F.lit(c) if isinstance(c, (str, int)) else c for c in cols]))


def _pick(arr: list[str], col: F.Column) -> F.Column:
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (col % len(arr) + 1).cast("int"))


def generate_transcripts_spark(
    spark: SparkSession,
    n_conversations: int,
    seed: int = 42,
    avg_cluster_size: float = 7.3,
    token_tag: str = "",
) -> DataFrame:
    """Returns turn-level rows (conv_id, turn_idx, role, text, tool, ts,
    truth_cluster_id). Deterministic in (n_conversations, seed).

    ``token_tag`` suffixes every text token, making the corpus's vocabulary
    DISJOINT from any untagged (or differently-tagged) corpus: no shingle,
    signature, or scored pair can cross the tag boundary. Used to model the
    common production INCR shape — a delta batch of genuinely NEW entities
    that links to nothing existing — next to the default chained shape whose
    deltas merge into existing clusters."""
    n_clusters = max(1, int(n_conversations / avg_cluster_size))
    clusters = spark.range(n_clusters).select(F.col("id").alias("cluster"))

    # inverse-CDF cluster size (reference distribution, benchmark-results.md:205-218)
    u = (_h(seed, "size", F.col("cluster")) % 10_000) / 10_000.0
    size = (
        F.when(u < 0.35, 1)
        .when(u < 0.60, 2)
        .when(u < 0.80, (3 + _h(seed, "s35", F.col("cluster")) % 3).cast("int"))
        .when(u < 0.92, (6 + _h(seed, "s615", F.col("cluster")) % 10).cast("int"))
        .when(u < 0.97, (16 + _h(seed, "s1650", F.col("cluster")) % 35).cast("int"))
        .when(u < 0.99, (51 + _h(seed, "s51", F.col("cluster")) % 150).cast("int"))
        .otherwise((201 + _h(seed, "s201", F.col("cluster")) % 800).cast("int"))
    )
    cl = clusters.select(
        "cluster",
        size.alias("size"),
        (2 + _h(seed, "nt", F.col("cluster")) % 7).cast("int").alias("n_turns"),
        (_h(seed, "ticket", F.col("cluster")) % 100_000).alias("ticket"),
        (_h(seed, "chain", F.col("cluster")) % 100 < 15).alias("chain_mode"),
    )
    members = cl.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("size") - 1)).alias("member")
    )
    turns = members.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx")
    )

    c, m, t = F.col("cluster"), F.col("member"), F.col("turn_idx")
    # chain mode: each member derives from its predecessor's text stream, so
    # similarity decays along the chain (A~B, B~C, transitivity via clustering)
    text_gen = F.when(F.col("chain_mode"), m).otherwise(F.lit(0))

    role = F.when(t % 2 == 0, "user").otherwise("assistant")
    tool = F.when(t % 2 == 1, _pick(_TOOLS, _h(seed, "tool", c, t))).otherwise(F.lit(None))

    # base body: topic + filler + per-cluster entropy + long-tail words
    topic = _pick(_TOPICS, _h(seed, "topic", c))
    filler = _pick(_FILLER, _h(seed, "fill", c, t))
    ent = F.concat_ws(
        " ",
        *[F.concat(F.lit("e"), (_h(seed, "ent", c, t, j) % 100_000).cast("string")) for j in range(3)],
    )
    tail = F.concat_ws(
        " ",
        *[F.concat(F.lit("w"), (_h(seed, "tail", c, t, j) % 5_000).cast("string")) for j in range(8)],
    )
    opening = F.concat_ws(
        " ", F.lit("hello i need help with"), topic, F.lit("ticket"), F.col("ticket").cast("string"), ent, tail
    )
    body = F.concat_ws(
        " ", topic, filler, F.lit("step"), t.cast("string"), F.lit("ref"),
        F.col("ticket").cast("string"), ent, tail,
    )
    base_text = F.when(t == 0, opening).otherwise(body)

    # member variant signal (member 0 = canonical)
    sig = _h(seed, "sig", c, m, text_gen) % 100
    # paraphrase: deterministically perturb ~12% of words (drop 6%, suffix 6%)
    words = F.split(base_text, " ")
    perturbed = F.array_join(
        F.filter(
            F.transform(
                words,
                lambda w, i: F.when(_h(seed, "pp", c, m, i, w) % 100 < 6, F.lit(""))
                .when(_h(seed, "pp", c, m, i, w) % 100 < 12, F.concat(w, F.lit("x")))
                .otherwise(w),
            ),
            lambda w: F.length(w) > 0,
        ),
        " ",
    )
    # structure-match: same opening + roles/tools, unrelated tail turns
    alt_body = F.concat_ws(
        " ", filler, F.lit("variant"), m.cast("string"), c.cast("string"), t.cast("string"), tail
    )
    text = (
        F.when(m == 0, base_text)
        .when(sig < 30, base_text)  # exact duplicate
        .when(sig < 75, perturbed)  # LSH + score path
        .otherwise(F.when(t == 0, opening).otherwise(alt_body))  # composite-key path
    )
    if token_tag:
        text = F.array_join(
            F.transform(F.split(text, " "), lambda w: F.concat(w, F.lit(token_tag))), " "
        )

    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=(_h(seed, "ts", c, m) % 500_000).cast("double")
    )
    return turns.select(
        F.concat(F.lit("c"), F.lpad(((c * 100_000) + m).cast("string"), 12, "0")).alias("conv_id"),
        t.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        (ts + F.make_interval(secs=(t * 30).cast("double"))).alias("ts"),
        F.concat(F.lit("tc"), c.cast("string")).alias("truth_cluster_id"),
    )
