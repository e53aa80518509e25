"""Histogram quantiles vs a pure-Python twin of the same rank rule."""

from __future__ import annotations

import math
import random

from code_graph_rag_spark.operators.quantiles import histogram_quantiles


def _twin(vals, lo, hi, n_bins, q):
    w = (hi - lo) / n_bins
    bins = sorted(
        min(max(math.floor((v - lo) / w), 0), n_bins - 1) for v in vals
    )
    rank = math.ceil(q * len(bins))
    return round(lo + bins[rank - 1] * w, 6)


def test_histogram_quantiles_match_twin(spark):
    rng = random.Random(3)
    rows = [
        (f"g{i % 3}", round(rng.uniform(0, 10), 3)) for i in range(900)
    ]
    df = spark.createDataFrame(rows, ["grp", "v"])
    got = {
        (r["grp"], r["q"]): (r["estimate"], r["n_rows"])
        for r in histogram_quantiles(
            df, "v", "grp", 0.0, 10.0, n_bins=500, qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for q in (0.5, 0.9, 0.99):
            est, n = got[(g, q)]
            assert n == len(vals)
            assert est == _twin(vals, 0.0, 10.0, 500, q), (g, q)


def test_histogram_quantiles_clamps_and_error_bound(spark):
    # out-of-range values clamp into edge bins; estimate is within one bin
    # width below the true quantile value
    vals = [-5.0, 0.0, 2.5, 5.0, 7.5, 9.999, 42.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["grp", "v"])
    rows = histogram_quantiles(
        df, "v", "grp", 0.0, 10.0, n_bins=100, qs=(0.5,)
    ).collect()
    assert len(rows) == 1 and rows[0]["n_rows"] == 7
    # rank = ceil(0.5*7) = 4 → 4th smallest bin = bin(5.0) = 50 → 5.0
    assert rows[0]["estimate"] == 5.0
