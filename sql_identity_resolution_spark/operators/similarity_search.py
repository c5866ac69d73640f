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


def _best_cells(df: DataFrame, key: str, carry: list[str], n: int = 1) -> DataFrame:
    """top-n cells by sim per ``key`` WITHOUT a per-row window. n=1: a hash agg
    of ``MAX(struct(sim, −cell_id))`` — one map-side-combining shuffle on the
    key instead of a full sort of key×n_cells rows. n>1: collect the (tiny,
    ≤n_cells) sim list per key and slice its sorted prefix — still a hash agg,
    no global sort. Ties (equal sim) break to the smallest cell_id, matching
    the SQL oracle's ORDER BY sim DESC, cell_id. cell_id is never negated so
    non-numeric ids (e.g. string vec ids) order correctly too."""
    if n == 1:
        return (
            df.groupBy(key)
            .agg(
                F.min(F.struct((-F.col("sim")).alias("_nsim"), F.col("cell_id"))).alias("_m"),
                *[F.first(c).alias(c) for c in carry],
            )
            .select(key, *carry, F.col("_m.cell_id").alias("cell_id"))
        )
    return (
        df.groupBy(key)
        .agg(
            F.collect_list(F.struct("sim", "cell_id")).alias("_sc"),
            *[F.first(c).alias(c) for c in carry],
        )
        .select(
            key,
            *carry,
            F.explode(
                F.slice(
                    F.array_sort(
                        F.transform(
                            "_sc",
                            lambda s: F.struct((-s["sim"]).alias("nsim"), s["cell_id"].alias("cell_id")),
                        )
                    ),
                    1,
                    n,
                )
            ).alias("_top"),
        )
        .select(key, *carry, F.col("_top.cell_id").alias("cell_id"))
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
    refine: bool = True,
    n_assign: int = 2,
) -> DataFrame:
    """IVF-style ANN. Coarse quantizer: seed centroids are the ``n_cells``
    corpus vectors with the smallest sha2(id) (deterministic, hash-spread),
    then ONE k-means refinement pass (assign-all → per-cell mean, rounded to
    6dp so the refined centroids are bit-stable across engines/partitionings).
    Corpus rows assign to their nearest refined centroid via a broadcast join
    + ``MAX(struct)`` hash agg (no row_number window — the previous version
    shuffled corpus×n_cells rows through a sort just to argmax 16 sims).
    Each query probes its ``n_probe`` nearest cells and ranks only those
    cells' members.

    At 100 TB: centroid refinement is an O(N·n_cells) broadcast pass with a
    tiny (n_cells×dim) agg output — in production you'd train on a sample,
    but the plan shape (broadcast quantizer, bucketed probe join) is the same.
    Recall is approximate by construction; the test bar is mean recall ≥0.9
    vs brute force at n_probe=8/16 cells.
    """
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv"))
    cents = (
        c.withColumn("h", F.sha2(F.col("cid").cast("string"), 256))
        .orderBy("h")
        .limit(n_cells)
        .select(F.col("cid").alias("cell_id"), F.col("cv").alias("cent"))
    )

    def assign(df: DataFrame, key: str, vec: str, centroids: DataFrame, carry: list[str], n: int = 1) -> DataFrame:
        scored = df.crossJoin(F.broadcast(centroids)).select(
            key,
            *carry,
            "cell_id",
            (_dot(F.col("cent"), F.col(vec)) / (_norm(F.col("cent")) * _norm(F.col(vec)))).alias("sim"),
        )
        return _best_cells(scored, key, carry, n=n)

    if refine:
        # one k-means step: mean of assigned vectors per cell, per component
        seed_assign = assign(c, "cid", "cv", cents, carry=["cv"])
        comp_means = (
            seed_assign.select("cell_id", F.posexplode("cv").alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        cents = (
            comp_means.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.transform("pm", lambda s: s["m"]).alias("cent"))
        )

    # redundant indexing: each corpus vector lands in its n_assign nearest
    # cells (standard IVF spill-list trick — on weakly-clustered embeddings a
    # query's true neighbors often sit just across a Voronoi boundary; 2×
    # index size buys the recall a deeper probe can't)
    assigned = assign(c, "cid", "cv", cents, carry=["cv"], n=n_assign)
    # queries → n_probe cells (tiny query set: the window here is over
    # |queries|×n_cells rows, already broadcast-sized)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
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
    # distinct: with n_assign>1 the same (query, neighbor) pair can surface
    # via two shared cells; cosine is identical so plain distinct dedupes
    scored = (
        probes.join(assigned, "cell_id", "inner")
        .select(
            "query_id",
            F.col("cid").alias("neighbor_id"),
            F.round(_dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv"))), 6).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
