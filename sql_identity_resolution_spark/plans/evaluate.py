"""Pairwise clustering evaluation: exact P/R/F1 over ALL pairs via the
contingency table (no pair sampling):

  TP = Σ_ij C(n_ij, 2)   over (predicted × truth) cell counts
  P  = Σ_i  C(a_i, 2)    predicted-cluster pair count
  T  = Σ_j  C(b_j, 2)    truth-cluster pair count

Scales to arbitrary corpus size: three groupBy-counts, one scalar collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PairwiseScores:
    precision: float
    recall: float
    f1: float
    true_pairs: int
    pred_pairs: int
    matched_pairs: int


def _pairs(n: F.Column) -> F.Column:
    return (n * (n - 1) / 2).cast("long")


def pairwise_f1(membership: DataFrame, truth: DataFrame, key: str = "entity_key") -> PairwiseScores:
    """membership: (entity_key, resolved_id); truth: (entity_key, truth_cluster_id)."""
    j = membership.select(key, "resolved_id").join(
        truth.select(key, "truth_cluster_id"), key, "inner"
    )
    tp = (
        j.groupBy("resolved_id", "truth_cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(_pairs(F.col("n"))).alias("x"))
        .first()["x"]
        or 0
    )
    p = (
        j.groupBy("resolved_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(_pairs(F.col("n"))).alias("x")).first()["x"] or 0
    )
    t = (
        j.groupBy("truth_cluster_id").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(_pairs(F.col("n"))).alias("x")).first()["x"] or 0
    )
    precision = tp / p if p else 1.0
    recall = tp / t if t else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return PairwiseScores(
        precision=round(precision, 6),
        recall=round(recall, 6),
        f1=round(f1, 6),
        true_pairs=int(t),
        pred_pairs=int(p),
        matched_pairs=int(tp),
    )
