"""Approximate-nearest-neighbor similarity search over an embedding column.

Two paths:
- ``brute_force_topk`` — exact cosine top-k (baseline): broadcast the query
  set, JVM-side dot products (``F.zip_with``/``F.aggregate``), window top-k.
- ``ivf_topk`` — the scale path: a deterministic IVF-style coarse quantizer
  (k centroids picked as hash-spread corpus vectors, Voronoi assignment via
  the same JVM dot products) restricts each query to its ``n_probe`` nearest
  cells — at 100 TB this turns an all-pairs pass into a per-cell join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(_dot(a, a))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector. Queries broadcast (small side);
    the corpus never shuffles. Output: (query_id, neighbor_id, cosine, rank),
    cosine rounded 6dp, rank ties broken by neighbor_id."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(_dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: centroids = the ``n_cells`` corpus vectors with the
    smallest sha2(id) (deterministic, spread); corpus rows assign to their
    nearest centroid (one broadcast join); each query probes its ``n_probe``
    nearest cells and ranks only those cells' members.

    Recall is approximate by construction; at bench scale we verify overlap
    against brute force rather than exact equality.
    """
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv"))
    cents = (
        c.withColumn("h", F.sha2(F.col("cid").cast("string"), 256))
        .orderBy("h")
        .limit(n_cells)
        .select(F.col("cid").alias("cell_id"), F.col("cv").alias("cent"))
    )
    cents_b = F.broadcast(cents)

    def nearest_cells(vec_col_expr, n):
        scored = cents_b.select(
            "cell_id",
            (_dot(F.col("cent"), vec_col_expr) / (_norm(F.col("cent")) * _norm(vec_col_expr))).alias("sim"),
        )
        return scored

    # corpus → best cell
    assigned = (
        c.crossJoin(cents_b)
        .select(
            "cid",
            "cv",
            "cell_id",
            (_dot(F.col("cent"), F.col("cv")) / (_norm(F.col("cent")) * _norm(F.col("cv")))).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(Window.partitionBy("cid").orderBy(F.desc("sim"), F.asc("cell_id"))))
        .filter(F.col("rn") == 1)
        .select("cid", "cv", "cell_id")
    )
    # queries → n_probe cells
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probes = (
        q.crossJoin(cents_b)
        .select(
            "query_id",
            "qv",
            "cell_id",
            (_dot(F.col("cent"), F.col("qv")) / (_norm(F.col("cent")) * _norm(F.col("qv")))).alias("sim"),
        )
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell_id")))
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell_id")
    )
    scored = probes.join(assigned, "cell_id", "inner").select(
        "query_id",
        F.col("cid").alias("neighbor_id"),
        F.round(_dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
