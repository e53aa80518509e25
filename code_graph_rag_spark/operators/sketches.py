"""Deterministic cardinality sketches (approximate distinct counting).

At 100 TB, exact ``count(DISTINCT x)`` per group is a full shuffle of every
distinct value; sketches carry O(k) state per group through map-side
partial aggregation instead. Spark's built-in ``approx_count_distinct`` is
HLL++ whose register layout is engine-internal — useless for a
value-exact oracle. This module implements the classic
stochastic-averaging minimum-value estimator (the KMV/MinCount family:
Bar-Yossef et al. 2002, Flajolet et al.'s stochastic averaging) on the
repo's portable md5-derived 60-bit hash, so the DuckDB oracle replays the
ENTIRE sketch bit-for-bit — the estimate itself is the verified value,
not just the exact twin.

Estimator: hash each value to u = h/2⁶⁰ ∈ [0,1); split values into k
buckets by h mod k; per bucket keep m_b = min(u), with EMPTY buckets
counting as m_b = 1. Each m_b is ≈ Exp(n/k)-distributed, so the SUM of
the k registers concentrates (relative sd ~1/√k) and
n̂ = k²/Σ_b m_b − k has finite moments (E[Σ m_b] = k²/(n+k) exactly for
uniform draws). Per-bucket inversion (Σ 1/m_b) is the classic trap —
1/min is heavy-tailed with divergent expectation and overestimates by
~an order of magnitude at small bucket occupancy (measured 8× on 500
distinct); invert the concentrated sum, never the raw minima.

Plan shape: the k per-bucket minimums are k conditional ``min``
aggregates in ONE ``groupBy(group)`` (the simhash pattern) — map-side
combine means the shuffle carries k doubles per group, never the values;
the estimate folds the k registers in fixed bucket order, so the double
is reproducible and bit-comparable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import hash60

_TWO60 = float(1 << 60)


def approx_distinct_kmv(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, approx_distinct, n_rows) — deterministic approximate distinct
    count of ``value_col`` per group, k-register minimum-value sketch."""
    h = hash60(F.col(value_col).cast("string"))
    u = (h.cast("double") / F.lit(_TWO60)).alias("u")
    b = (h % k).alias("b")
    base = df.select(F.col(group_col).alias("grp"), u, b)
    mins = [
        F.min(F.when(F.col("b") == i, F.col("u"))).alias(f"m{i}")
        for i in range(k)
    ]
    agg = base.groupBy("grp").agg(F.count("*").alias("n_rows"), *mins)
    reg_sum: Column = F.lit(0.0)
    for i in range(k):  # fixed bucket-order fold — reproducible double
        reg_sum = reg_sum + F.coalesce(F.col(f"m{i}"), F.lit(1.0))
    est = F.lit(float(k * k)) / reg_sum - F.lit(float(k))
    return agg.select(
        F.col("grp").alias(group_col),
        F.round(est, 4).alias("approx_distinct"),
        "n_rows",
    ).orderBy(group_col)
