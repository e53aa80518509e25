"""Deterministic fixed-bin histogram quantiles.

The classic distributed quantile estimators (GK, KLL, t-digest —
`approx_percentile` in Spark) give tighter error per byte but their merge
order is partition-dependent, so their output cannot be certified against
an independent engine. A fixed-bin equi-width histogram is the
deterministic alternative: the sketch is a pure function of the value
multiset, the error bound is explicit (one bin width), and the DuckDB
oracle re-derives the identical estimate from the same formula — a dual
implementation, not a replay.

Scale shape: ONE ``groupBy(group, bin)`` count (map-side partial combine,
shuffle keyed by (group, bin) so hot groups spread across their bins),
then a per-group cumulative window over at most ``n_bins`` rows. At 100 TB
the shuffle carries ≤ groups × n_bins rows regardless of input size —
the same reduction property that makes histogram-based percentiles the
standard warehouse pattern when determinism matters more than the last
decimal of accuracy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_quantiles(
    df: DataFrame,
    value: str,
    group: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group quantile estimates from an equi-width histogram on
    [lo, hi).

    A value maps to bin ``clamp(floor((x - lo) / w), 0, n_bins - 1)`` with
    ``w = (hi - lo) / n_bins`` (out-of-range values clamp into the edge
    bins). The q-quantile estimate is the LOWER EDGE of the first bin
    whose cumulative count reaches ``ceil(q * n)`` — a deterministic
    integer rank rule, so both engines agree exactly. NULL values are
    dropped before binning (``n_rows`` counts non-null values): Spark's
    cumulative window would order a NULL bin first while DuckDB orders it
    last — filtering makes both engines agree by construction. Returns
    (group, q, estimate, n_rows) ordered by (group, q); estimate is
    rounded to 6 to absorb float formatting, not algorithmic, noise.
    """
    w = (hi - lo) / n_bins
    bin_col = F.least(
        F.greatest(
            F.floor((F.col(value) - F.lit(lo)) / F.lit(w)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("long")
    hist = (
        df.filter(F.col(value).isNotNull())
        .select(F.col(group).alias("grp"), bin_col.alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    cum_w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "bin",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(tot_w).alias("n_rows"),
    )
    q_df = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], ["q"]
    )
    # rank = ceil(q * n); the first bin with cum >= rank wins (min bin)
    est = (
        cum.crossJoin(F.broadcast(q_df))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n_rows")))
        .groupBy("grp", "q", "n_rows")
        .agg(F.min("bin").alias("qbin"))
        .select(
            F.col("grp").alias(group),
            "q",
            F.round(F.lit(lo) + F.col("qbin") * F.lit(w), 6).alias(
                "estimate"
            ),
            "n_rows",
        )
    )
    return est.orderBy(group, "q")
