"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — the exactness baseline: query×corpus equi-free join
  with the small query side **broadcast**, cosine in JVM expressions
  (``zip_with`` + ``aggregate``), per-query top-k via window rank. At 100 TB
  the corpus side streams through once; no shuffle of the corpus.
* ``lsh_topk`` — the scale path: random-hyperplane (sign) LSH buckets;
  queries probe only their bucket (+ optional multi-probe), turning the scan
  into an equi-join on bucket id.
* ``embedding_near_duplicates`` — near-dup detection by cosine ≥ τ within
  LSH buckets.

Hyperplanes are deterministic (seeded hash-based), so results are stable
across runs and parallelism levels.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    ``queries``: (query_id, q_embedding). The query side is broadcast; the
    corpus is scanned once with the cosine evaluated in codegen'd JVM
    expressions — no Python in the loop.
    """
    q = F.broadcast(queries.select("query_id", "q_embedding"))
    scored = corpus.select("vec_id", "embedding").crossJoin(q).select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("q_embedding"), F.col("embedding")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (no RNG state)."""
    vals = [
        math.sin(0.7 + plane_idx * 12.9898 + j * 78.233) * 43758.5453 % 1.0
        - 0.5
        for j in range(dim)
    ]
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / norm for v in vals]


def sign_lsh_bucket(col, dim: int, n_planes: int = 8):
    """Bucket id = sign bits against n deterministic hyperplanes."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array([F.lit(v) for v in _hyperplane(dim, p)])
        dot = F.aggregate(
            F.zip_with(col, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket * 2 + (dot > 0).cast("int")
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    At scale the corpus is pre-bucketed (one pass, writable as a bucketed
    table) and each query touches 1/2^planes of the data.
    """
    cb = corpus.withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), dim, n_planes)
    )
    qb = F.broadcast(
        queries.withColumn(
            "bucket", sign_lsh_bucket(F.col("q_embedding"), dim, n_planes)
        )
    )
    scored = cb.join(qb, "bucket").select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("q_embedding"), F.col("embedding")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_duplicates(
    corpus: DataFrame, dim: int, threshold: float = 0.95, n_planes: int = 6
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) within LSH buckets."""
    cb = corpus.withColumn(
        "bucket", sign_lsh_bucket(F.col("embedding"), dim, n_planes)
    )
    a = cb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        "bucket",
    )
    b = cb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
