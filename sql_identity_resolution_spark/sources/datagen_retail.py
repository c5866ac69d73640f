"""Distributed retail-customer corpus generator — the reference-parity bench.

Mirrors the REFERENCE benchmark generator's statistical shape
(``tools/scale_test/data_generator.py``) so our engine can run the published
10M-row EXACT-only campaign (``docs/performance/benchmark-results.md:24-38``)
on a directly comparable corpus:

- entity-weighted cluster-size buckets (35% singletons / 25% pairs / 20%
  size 3-5 / 12% 6-15 / 5% 16-50 / 2% 51-200 / 1% 201-1000 —
  ``data_generator.py:63-72,394-402``: ``target_entities = rows * pct``,
  uniform size within the bucket),
- per-CLUSTER share flags (email 55% / phone 25% / loyalty 10% / address 10%,
  ``data_generator.py:356-359``),
- per-MEMBER inheritance: non-chain members copy the ANCHOR's identifier
  (email w.p. 0.7, phone 0.5, loyalty 1.0, address 1.0 given the share flag);
  ~15% of members are CHAIN members that copy the PREVIOUS member's
  (possibly itself inherited) identifier instead — transitive chains
  (``data_generator.py:364-381``),
- five source systems with the reference's mix and loyalty/address presence
  (``data_generator.py:86-92``).

Everything derives from ``xxhash64`` of (seed, cluster, member, field): no
Python in the loop, no RNG state, embarrassingly parallel at any scale.

The one non-trivial Spark bit is chain resolution: ``prev["email"]`` in the
reference is recursive (the previous member's email may itself be inherited).
Closed form: emit ``base = member_idx`` where the member mints its OWN value,
``0`` where it copies the anchor, NULL where it chains — then
``last(base, ignoreNulls)`` over (cluster, member-order) resolves every chain
to the nearest preceding minting member. One window, one shuffle, shared by
all four identifier types.

Deviations from the reference generator (documented, conservative): no typo
injection (data_quality noise only removes EXACT matches — our corpus links
slightly MORE than theirs, i.e. more work, never less) and names/cities are
synthetic ids rather than word lists (EXACT rules never read them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_identity_resolution_spark.config import (
    IdentifierMapping,
    Rule,
    SourceTable,
)

# (size_min, size_max, entity_pct) ≙ data_generator.py:63-72
_BUCKETS = [
    (1, 1, 0.35),
    (2, 2, 0.25),
    (3, 5, 0.20),
    (6, 15, 0.12),
    (16, 50, 0.05),
    (51, 200, 0.02),
    (201, 1000, 0.01),
]

# "published" truth-cluster mix: the committed bucket table above yields
# ~5.39M truth clusters per 10M rows (~1.85 rows/cluster), but the PUBLISHED
# campaign reports 1.84M resolved clusters (~5.4 rows/cluster,
# docs/performance/benchmark-results.md:33-38) — their campaign internals
# linked more than the committed yaml. This mix shifts entity mass out of
# singletons/pairs so the TRUTH component count lands at ~1.87M per 10M rows
# (≈ the published resolved count); identifier share/inherit rates are then
# calibrated (see generate_retail_spark mix="published") so resolved ≈ truth
# and edge volume ≈ the published 16.1M.
_BUCKETS_PUBLISHED = [
    (1, 1, 0.04),
    (2, 2, 0.10),
    (3, 5, 0.24),
    (6, 15, 0.32),
    (16, 50, 0.20),
    (51, 200, 0.08),
    (201, 1000, 0.02),
]

# (source_id, cum_pct_threshold, has_loyalty, has_address) ≙ :86-92
_SOURCES = [
    ("web", 35, True, True),
    ("store", 65, True, False),
    ("mobile", 85, True, True),
    ("call_center", 95, True, True),
    ("partner", 100, False, False),
]


def _h(*cols) -> F.Column:
    return F.abs(
        F.xxhash64(*[F.lit(c) if isinstance(c, (str, int)) else c for c in cols])
    )


def generate_retail_spark(
    spark: SparkSession, n_rows: int, seed: int = 42, dense: bool = False, mix: str = "committed"
) -> DataFrame:
    """Flat customer-record table: one row per record, identifier columns
    shared within truth clusters per the reference distributions. Row count
    is ~n_rows (bucket sizes are hash-sampled; expectation matches exactly).

    ``dense=False`` (standard) reproduces the COMMITTED reference config
    (20m_standard.yaml): analytically ~0.30 star-edges/row — which the
    committed generator mathematically produces, though the PUBLISHED campaign
    reports 1.61 edges/row (16.1M @ 10M; not derivable from the committed
    code: per-member expected identifier inheritance is
    0.55·0.7 + 0.25·0.5 + 0.10·0.95 + 0.10·0.65·0.85 ≈ 0.65, and only ~46% of
    rows are non-anchors ⇒ ~0.30 edges/row). ``dense=True`` raises the
    share/inherit rates (email 95/95, phone 90/90, loyalty 85, address 80) to
    ~1.35 star-edges/row — calibrated to the PUBLISHED edge volume so the LP
    stage carries a comparable graph.

    ``mix="published"`` swaps in the `_BUCKETS_PUBLISHED` cluster-size table
    AND its own identifier share/inherit rates, calibrated TOGETHER so BOTH
    published axes land: resolved clusters ≈ 1.84M/10M rows (truth mix ≈
    resolved because inheritance is near-total — members that inherit no
    identifier split off as resolved singletons, so high per-type rates are
    required once singleton mass shrinks) and edge volume ≈ the published
    16.1M (non-anchor fraction rises from 0.46 to ~0.81, so per-type rates
    must sit BELOW the dense variant's or edges overshoot ~2×).

    Columns: customer_record_id, source_system, email, phone, loyalty_id,
    address, updated_ts, truth_cluster_id."""
    if mix not in ("committed", "published"):
        raise ValueError(f"mix must be committed|published, got {mix}")
    buckets = _BUCKETS_PUBLISHED if mix == "published" else _BUCKETS
    # exact per-bucket cluster counts from the entity-weighted expectation
    counts = [max(1, round(n_rows * pct / ((lo + hi) / 2))) for lo, hi, pct in buckets]
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    clusters = spark.range(offsets[-1]).select(F.col("id").alias("cluster"))

    size = F.lit(1)
    for (lo, hi, _), o0, o1 in zip(buckets, offsets[:-1], offsets[1:]):
        width = hi - lo + 1
        expr = (F.lit(lo) + (_h(seed, "sz", F.col("cluster")) % width)).cast("int")
        cond = (F.col("cluster") >= o0) & (F.col("cluster") < o1)
        size = F.when(cond, expr).otherwise(size)

    c = F.col("cluster")
    if mix == "published":
        se, sp, sl, sa = (85, 55, 72, 42)
    else:
        se, sp, sl, sa = (95, 90, 85, 80) if dense else (55, 25, 10, 10)
    cl = clusters.select(
        "cluster",
        size.alias("size"),
        # per-cluster share flags ≙ data_generator.py:356-359
        (_h(seed, "se", c) % 100 < se).alias("share_email"),
        (_h(seed, "sp", c) % 100 < sp).alias("share_phone"),
        (_h(seed, "sl", c) % 100 < sl).alias("share_loyalty"),
        (_h(seed, "sa", c) % 100 < sa).alias("share_address"),
    )
    m = cl.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("size") - 1)).alias("member")
    )

    i = F.col("member")
    # source assignment ≙ :86-92 proportions
    spick = _h(seed, "src", c, i) % 100
    src = None
    has_loyalty = None
    has_address = None
    for sid, cum, hl, ha in _SOURCES:
        cond = spick < cum
        src = F.when(cond, sid) if src is None else src.when(cond, sid)
        has_loyalty = (
            F.when(cond, hl) if has_loyalty is None else has_loyalty.when(cond, hl)
        )
        has_address = (
            F.when(cond, ha) if has_address is None else has_address.when(cond, ha)
        )
    chain = (i > 1) & (_h(seed, "ch", c, i) % 100 < 15)  # ≙ :364

    def _base(flag, p_anchor: int, q_chain: int, tag: str, gate=None):
        """base member index whose minted value this member carries:
        member-own ⇒ i, anchor-copy ⇒ 0, chain-copy ⇒ NULL (resolved by the
        last-non-null window below)."""
        share = F.col(flag) if gate is None else (F.col(flag) & gate)
        anchor_copy = share & ~chain & (_h(seed, tag + "a", c, i) % 100 < p_anchor)
        chain_copy = share & chain & (_h(seed, tag + "c", c, i) % 100 < q_chain)
        return (
            F.when(i == 0, F.lit(0))
            .when(chain_copy, F.lit(None))
            .when(anchor_copy, F.lit(0))
            .otherwise(i)
        )

    # (anchor-copy, chain-copy) inheritance pcts ≙ data_generator.py:366-381
    if mix == "published":
        (p_em, q_em), (p_ph, q_ph) = (88, 88), (75, 75)
    else:
        (p_em, q_em), (p_ph, q_ph) = ((95, 95), (90, 90)) if dense else ((70, 50), (50, 50))
    m = m.select(
        "*",
        _base("share_email", p_em, q_em, "em").alias("_b_email"),
        _base("share_phone", p_ph, q_ph, "ph").alias("_b_phone"),
        _base("share_loyalty", 100, 100, "lo", gate=has_loyalty).alias("_b_loyalty"),
        # chain branch passes no address (":366-371"): q=0
        _base("share_address", 100, 0, "ad", gate=has_address).alias("_b_address"),
        src.alias("source_system"),
        has_loyalty.alias("_hl"),
        has_address.alias("_ha"),
    )
    w = Window.partitionBy("cluster").orderBy("member").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for t in ("email", "phone", "loyalty", "address"):
        m = m.withColumn(f"_r_{t}", F.last(f"_b_{t}", ignorenulls=True).over(w))

    uid = lambda rcol: (c * 1000 + F.col(rcol)).cast("long")  # sizes ≤ 1000 ⇒ unique
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=(_h(seed, "ts", c, i) % 5_000_000).cast("double")
    )
    out = m.select(
        F.concat(F.lit("r"), F.lpad((c * 1000 + i).cast("string"), 12, "0")).alias(
            "customer_record_id"
        ),
        "source_system",
        F.concat(F.lit("User"), uid("_r_email").cast("string"), F.lit("@Example.com")).alias(
            "email"
        ),
        F.concat(
            F.lit("+1 ("),
            F.lpad((uid("_r_phone") % 1000).cast("string"), 3, "0"),
            F.lit(") 555-"),
            F.lpad(((uid("_r_phone") / 1000).cast("long") % 10_000).cast("string"), 4, "0"),
            F.lit(" #"),
            uid("_r_phone").cast("string"),
        ).alias("phone"),
        F.when(F.col("_hl"), F.concat(F.lit("LOY"), uid("_r_loyalty").cast("string"))).alias(
            "loyalty_id"
        ),
        F.when(
            F.col("_ha"),
            F.concat(
                uid("_r_address").cast("string"),
                F.lit(" Main St, Springfield, "),
                F.lpad((uid("_r_address") % 50).cast("string"), 2, "0"),
                F.lit(" "),
                F.lpad((uid("_r_address") % 100_000).cast("string"), 5, "0"),
            ),
        ).alias("address"),
        ts.alias("updated_ts"),
        F.concat(F.lit("tc"), c.cast("string")).alias("truth_cluster_id"),
    )
    return out


def retail_source(table_id: str, path: str):
    """(SourceTable, rules, mappings) for the flat retail corpus — EXACT-only,
    the reference's own rule set (email/phone/loyalty/address,
    ``sql/common/00_ddl_meta.sql`` seed rows + ``10_extract_identifiers.sql``
    canonicalization): the directly-comparable workload for BASELINE.md's
    published 10M-row numbers."""
    source = SourceTable(
        table_id=table_id,
        entity_key_expr="customer_record_id",
        watermark_column="updated_ts",
        path=path,
    )
    rules = [
        Rule("R_EMAIL_EXACT", "EMAIL", "email exact", priority=1, canonicalize="LOWERCASE"),
        Rule("R_PHONE_EXACT", "PHONE", "phone digits exact", priority=2, canonicalize="DIGITS"),
        Rule("R_LOYALTY_EXACT", "LOYALTY", "loyalty exact", priority=3, canonicalize="UPPERCASE"),
        Rule("R_ADDRESS_EXACT", "ADDRESS", "address exact", priority=4, canonicalize="LOWERCASE"),
    ]
    mappings = [
        IdentifierMapping(table_id, "EMAIL", "email"),
        IdentifierMapping(table_id, "PHONE", "phone"),
        IdentifierMapping(table_id, "LOYALTY", "loyalty_id"),
        IdentifierMapping(table_id, "ADDRESS", "address"),
    ]
    return source, rules, mappings
