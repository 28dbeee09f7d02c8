"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products are computed
  with JVM higher-order functions (zip_with + aggregate) in strict
  left-to-right double precision, so results are bit-reproducible across
  engines (the DuckDB oracle uses list_reduce with the same fold order).
- LSH-bucketed ANN (the scale path): sign-bit buckets from fixed random
  hyperplanes; candidates searched within the query's bucket only. At
  10^12 rows the bucketed variant turns the O(N*Q) cross join into a
  bucket-equi-join; plane constants are deterministic (seeded) and shared
  with the SQL oracle.
- embedding near-dup: pairs above a cosine threshold (bit-reproducible).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_PLANES = 4


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes; values quantized to 3
    decimals so literal embedding in SQL text is exact."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 3) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def dot_expr(a: str, b: str) -> Column:
    """Strict left-to-right double dot product of two array columns.
    0.0 + x == x exactly, so a 0.0-seeded fold equals a first-element-seeded
    fold — this matches DuckDB's list_reduce bit-for-bit."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query row, the k nearest
    corpus rows (excluding self), ranked by cosine desc, ties by id asc."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    j = q.crossJoin(c).where(F.col("q_id") != F.col("n_id"))
    cos = (dot_expr("q_vec", "n_vec") / (norm_expr("q_vec") * norm_expr("n_vec"))).alias("cosine")
    scored = j.select("q_id", "n_id", cos)
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Bucket id = sum over planes of (dot(vec, plane) > 0) << j."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    The bucket join replaces the cross join — this is the 100TB shape."""
    b = lsh_bucket_expr(vec_col, planes)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), b.alias("bucket"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), b.alias("bucket"))
    j = q.join(c, "bucket").where(F.col("q_id") != F.col("n_id"))
    cos = (dot_expr("q_vec", "n_vec") / (norm_expr("q_vec") * norm_expr("n_vec"))).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        j.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


N_CENTROIDS = 8


def ivf_centroids(dim: int, k: int = N_CENTROIDS, seed: int = 7) -> list[list[float]]:
    """Deterministic IVF 'coarse quantizer' centroids. Seeded and quantized
    to 3 decimals so the SQL oracle can embed them as literals. (With a
    trained model you would plug k-means centroids here; the routing,
    bucketing and probe plumbing below is identical either way.)"""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 3) for x in rng.standard_normal(dim)] for _ in range(k)]


def ivf_assign_expr(vec_col: str, centroids: list[list[float]]) -> Column:
    """Assigned list = argmax over centroids of dot(vec, centroid); ties go
    to the lowest centroid index (deterministic, SQL-mirrorable)."""
    dots = []
    for c in centroids:
        arr = F.array(*[F.lit(float(v)) for v in c])
        dots.append(
            F.aggregate(
                F.zip_with(F.col(vec_col), arr, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
    best = F.greatest(*dots)
    assigned = F.lit(None).cast("int")
    for i in reversed(range(len(centroids))):
        assigned = F.when(dots[i] == best, F.lit(i)).otherwise(assigned)
    return assigned


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search with nprobe=1: corpus rows are bucketed by nearest
    centroid; each query searches only its own bucket. The bucket join is
    the 100TB shape — the inverted lists are just a partitioned layout."""
    a = ivf_assign_expr(vec_col, centroids)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"), a.alias("lst"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"), a.alias("lst"))
    j = q.join(c, "lst").where(F.col("q_id") != F.col("n_id"))
    cos = (dot_expr("q_vec", "n_vec") / (norm_expr("q_vec") * norm_expr("n_vec"))).alias("cosine")
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        j.select("q_id", "n_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )


def near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= thr)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    j = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = (dot_expr("va", "vb") / (norm_expr("va") * norm_expr("vb"))).alias("cosine")
    return j.select("id_a", "id_b", cos).where(F.col("cosine") >= threshold)
