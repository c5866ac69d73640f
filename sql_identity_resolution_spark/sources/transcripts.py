"""Transcripts source: turn-level table → conversation-level signature table.

Input (BASELINE.json input_hint): ``transcripts(conv_id string, turn_idx int,
role string, text string, tool string, ts timestamp)``. Entity = conversation;
``ts`` is the watermark column.

The signature is built under STRICT turn_idx ordering — ``array_sort`` over
``collect_list(struct(turn_idx, …))`` sorts lexicographically by the leading
turn_idx, so the per-turn text sequence is deterministic regardless of Spark's
row order (the per-turn-text-equality invariant vs the reference). Everything
except the MinHash signature is JVM-side; MinHash is one Arrow-batched pandas
UDF over the conversation text.

Blocking keys produced (≙ reference identifier types, SURVEY §7.1):
- ``SIG_ROLE_TOOL``  — sha2 of the role:tool sequence (exact composite key)
- ``SIG_FIRST_TEXT`` — sha2 of the normalized first-turn text (exact)
- ``SIG_FULL_TEXT``  — sha2 of the full normalized text (exact dup key)
- ``LSH_TEXT``       — MinHash band-key array (``explodes=True`` mapping; SCORED rule)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_identity_resolution_spark.config import (
    AttributeMapping,
    EngineConfig,
    IdentifierMapping,
    Rule,
    SourceTable,
)
from sql_identity_resolution_spark.functions.minhash import minhash_band_keys_udf

# cap the text fed to minhash/scoring: near-dup transcripts agree on their
# prefix window; the cap bounds per-conversation UDF cost at 10^12-turn scale.
MATCH_TEXT_MAX_CHARS = 4000


def conversation_signatures(
    turns: DataFrame,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """One row per conversation with signature + blocking-key columns."""
    norm = F.trim(F.regexp_replace(F.lower(F.coalesce(F.col("t.text"), F.lit(""))), r"[^a-z0-9]+", " "))
    ordered = (
        turns.alias("t")
        .groupBy(F.col("t.conv_id").alias("conv_id"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("t.turn_idx").alias("turn_idx"),
                        F.col("t.role").alias("role"),
                        norm.alias("text_norm"),
                        F.coalesce(F.col("t.tool"), F.lit("")).alias("tool"),
                    )
                )
            ).alias("turns"),
            F.max("t.ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    sig = ordered.select(
        "conv_id",
        "last_ts",
        "n_turns",
        # composite key: role:tool sequence ⊕ first-turn text — the role/tool
        # sequence alone is low-cardinality (most chats look user/assistant/…),
        # compositing keeps blocks discriminative (≙ reference's namespaced
        # composite keys, sql/common/10:21)
        F.sha2(
            F.concat_ws(
                "§",
                F.concat_ws(
                    "|",
                    F.transform("turns", lambda s: F.concat_ws(":", s["role"], s["tool"])),
                ),
                F.element_at("turns", 1)["text_norm"],
            ),
            256,
        ).alias("sig_role_tool"),
        F.sha2(F.element_at("turns", 1)["text_norm"], 256).alias("sig_first_text"),
        F.substring(
            F.concat_ws(" ", F.transform("turns", lambda s: s["text_norm"])),
            1,
            MATCH_TEXT_MAX_CHARS,
        ).alias("match_text"),
    )
    sig = sig.withColumn("sig_full_text", F.sha2("match_text", 256))
    band_udf = minhash_band_keys_udf(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    return sig.withColumn("lsh_bands", band_udf(F.col("match_text")))


def transcripts_source(
    table_id: str,
    turns_path: str,
    num_perm: int = 64,
    bands: int = 16,
    lsh_threshold: float = 0.6,
    max_group_size: int = 10_000,
) -> tuple[SourceTable, list[Rule], list[IdentifierMapping]]:
    """Wire a transcripts table into the generic pipeline: the SourceTable
    reads turn-level parquet and lifts it to conversation signatures; rules
    and mappings follow the reference's metadata pattern
    (metadata_samples/rule.csv shapes)."""

    def reader(spark):
        return conversation_signatures(spark.read.parquet(turns_path), num_perm=num_perm, bands=bands)

    def delta_reader(spark, since):
        """Signatures for DELTA conversations only: a pushed-down ts predicate
        finds conv_ids with any new turn, a semi-join pulls those
        conversations' FULL turn history (a changed conversation re-signs from
        scratch), and the groupBy + MinHash UDF run over just that slice —
        INCR cost ∝ delta, not corpus (the catalog identifier store supplies
        everyone else's signatures)."""
        turns = spark.read.parquet(turns_path)
        delta_ids = turns.filter(F.col("ts") >= F.lit(since)).select("conv_id").distinct()
        return conversation_signatures(
            turns.join(delta_ids, "conv_id", "left_semi"), num_perm=num_perm, bands=bands
        )

    source = SourceTable(
        table_id=table_id,
        entity_key_expr="conv_id",
        watermark_column="last_ts",
        reader=reader,
        delta_reader=delta_reader,
    )
    rules = [
        Rule("R_ROLE_TOOL_EXACT", "SIG_ROLE_TOOL", "role:tool sequence exact", priority=1,
             max_group_size=max_group_size),
        Rule("R_FULL_TEXT_EXACT", "SIG_FULL_TEXT", "full normalized text exact", priority=2,
             max_group_size=max_group_size),
        Rule("R_LSH_TEXT", "LSH_TEXT", "minhash band + jaccard score", priority=3,
             match_strategy="SCORED", scorer="token_jaccard", threshold=lsh_threshold,
             max_group_size=max_group_size),
    ]
    mappings = [
        IdentifierMapping(table_id, "SIG_ROLE_TOOL", "sig_role_tool"),
        IdentifierMapping(table_id, "SIG_FULL_TEXT", "sig_full_text"),
        IdentifierMapping(table_id, "LSH_TEXT", "lsh_bands", explodes=True),
    ]
    return source, rules, mappings


def transcripts_attributes(table_id: str) -> list[AttributeMapping]:
    """Golden-profile survivorship attributes for a transcripts source — the
    per-cluster canonical signature (≙ reference golden profile, SURVEY §7.2
    M2): most recent conversation's signature/text snippet + size features."""
    return [
        AttributeMapping("canonical_signature", table_id, "sig_full_text", "MOST_RECENT"),
        AttributeMapping("canonical_snippet", table_id, "substring(match_text, 1, 200)", "MOST_RECENT"),
        AttributeMapping("canonical_n_turns", table_id, "cast(n_turns as string)", "MOST_RECENT"),
    ]
