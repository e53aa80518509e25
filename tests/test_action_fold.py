"""Round-6 action-fold regression tests.

The iterative operators (ancestor closure, connected components, PageRank,
label propagation) fold each round's lineage-cut checkpoint and its
convergence action into ONE Spark job (``localCheckpoint(eager=False)``
materialized by the round's count/signature aggregate, or — for the
fixed-iteration algos — by the next round's first consumer). These tests
pin (a) the per-round job budget so an accidental return to eager
checkpoint + separate count shows up as a counted regression, and (b) the
operator results, so the fold can never drift semantics.
"""
from __future__ import annotations

from pyspark.sql import functions as F


def _njobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup())


def test_ancestor_closure_one_job_per_round(spark):
    from code_graph_rag_spark.plans.inherits import ancestor_closure

    inh = spark.createDataFrame(
        [("A", "B"), ("B", "C")], "subj string, obj string"
    ).select(
        "subj",
        F.lit("INHERITS").alias("pred"),
        "obj",
        F.lit("Class").alias("subj_label"),
        F.lit("Class").alias("obj_label"),
        F.create_map(F.lit("base_index"), F.lit("0")).alias("props"),
        F.lit("d").alias("src_doc"),
    )
    j0 = _njobs(spark)
    clo = ancestor_closure(inh)
    j1 = _njobs(spark)
    # executed rounds on an A→B→C chain: base + 1 growing doubling + 1
    # converged doubling = 3 counts; the fold makes each count the round's
    # ONLY job (pre-fold: 2 jobs per round = 6)
    assert j1 - j0 <= 4, f"closure used {j1 - j0} jobs (fold regressed?)"
    rows = sorted((r["cls"], r["anc"], r["depth"]) for r in clo.collect())
    assert rows == [("A", "B", 1), ("A", "C", 2), ("B", "C", 1)]


def test_connected_components_one_job_per_round(spark):
    from code_graph_rag_spark.linking import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "a int, b int"
    )
    j0 = _njobs(spark)
    cc = connected_components(pairs)
    got = sorted((r["entity_id"], r["canonical_id"]) for r in cc.collect())
    j1 = _njobs(spark)
    # 2 setup checkpoints + one signature job per star round (3 on this
    # fixture) + the caller's collect = 6; pre-fold this was 9
    assert j1 - j0 <= 7, f"cc used {j1 - j0} jobs (fold regressed?)"
    assert got == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]
