"""Similarity search over embedding columns (array<float>).

Two paths:
 - ``cosine_topk``: brute-force exact top-k — the correctness baseline.
   Cross-join queries x corpus with the dot product as a Catalyst
   higher-order fold (zip_with + aggregate): JVM-side, codegen'd, no Python.
   Cost O(|Q| * N) — fine when |Q| is small or N is a pre-filtered bucket.
 - ``ivf_topk``: the scale path — IVF-style bucketing.  Every vector is
   assigned to its nearest centroid (one shuffle on centroid id); queries
   search ONLY their own centroid bucket, cutting the scan by ~K.  Centroids
   are broadcast (tiny), so assignment is shuffle-free; the bucket join
   shuffles once on centroid_id.  At 100 TB this is the difference between a
   full-corpus cross join and a 1/K partition-pruned probe; recall can be
   raised by probing the P nearest centroids (``n_probe``).

Determinism: dot products fold in array-index order with DOUBLE math, so any
engine reproduces the same bits; cosine values are rounded to 6 decimals
before ranking and ties break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"


def _dot(a: str, b: str) -> str:
    return DOT.format(a=a, b=b)


def with_norm(df: DataFrame, vec_col: str = "e", out_col: str = "norm") -> DataFrame:
    return df.withColumn(out_col, F.expr(f"sqrt({_dot(vec_col, vec_col)})"))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k nearest corpus vectors
    (self-matches excluded).  Output: query_id, neighbor_id, cosine, rn."""
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("ve"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    )
    scored = (
        q.crossJoin(F.broadcast(v) if _small(v) else v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"round({_dot('qe', 've')} / "
                f"(sqrt({_dot('qe', 'qe')}) * sqrt({_dot('ve', 've')})), 6)"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def _small(df: DataFrame) -> bool:
    # queries side is usually tiny; broadcast decision left to Catalyst for
    # the corpus side — only hint when we know it helps.
    return False


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties -> lowest
    centroid id).  Centroids broadcast; ranking is a per-vector window over
    the K candidate scores."""
    v = vectors.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("ve")
    )
    c = centroids.select(
        F.col(cent_id_col), F.col(vec_col).cast("array<double>").alias("ce")
    )
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        "ve",
        cent_id_col,
        F.expr(
            f"round({_dot('ve', 'ce')} / "
            f"(sqrt({_dot('ve', 've')}) * sqrt({_dot('ce', 'ce')})), 6)"
        ).alias("__sim__"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim__").desc(), F.col(cent_id_col).asc()
    )
    return (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__sim__")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "centroid_id",
) -> DataFrame:
    """Approximate cosine top-k restricted to the query's centroid bucket.

    Both corpus and queries are assigned to centroids, then ranked only
    within matching buckets — the IVF probe.  Output columns match
    ``cosine_topk`` so the two are drop-in comparable for recall checks.
    """
    va = assign_centroids(vectors, centroids, id_col, vec_col, cent_id_col)
    qa = assign_centroids(queries, centroids, id_col, vec_col, cent_id_col)
    v = va.select(
        F.col(cent_id_col).alias("__vc__"),
        F.col(id_col).alias("neighbor_id"),
        F.col("ve"),
    )
    q = qa.select(
        F.col(cent_id_col).alias("__qc__"),
        F.col(id_col).alias("query_id"),
        F.col("ve").alias("qe"),
    )
    scored = (
        q.join(v, F.expr("__qc__ = __vc__ AND query_id <> neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                f"round({_dot('qe', 've')} / "
                f"(sqrt({_dot('qe', 'qe')}) * sqrt({_dot('ve', 've')})), 6)"
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
