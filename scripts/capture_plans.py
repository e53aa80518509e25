#!/usr/bin/env python
"""Capture .explain("formatted") for bench-leg queries into plans/r06/.

Usage: capture_plans.py <suffix> [query ...]
    suffix = "before" | "after" (file name: plans/r06/<query>_<suffix>.txt)
    no query names -> all of bench.BENCH_QUERIES.

Runs against the bench sf dir (SPARK_GRAFT_SF_DIR, default sf0.1) with the
same tuned session the bench uses, so plan shapes match the timed legs.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry
from bench import BENCH_QUERIES
from code_graph_rag_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _lazy_frame(spark, name: str, qs):
    """For queries that eagerly checkpoint-and-release (their entry frame
    explains as a bare RDD scan), rebuild the operator's LAZY frame so the
    captured plan shows the real dataflow."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if name == "dedup_cross_corpus":
        from code_graph_rag_spark.operators.dedup import cross_corpus_dups

        return cross_corpus_dups(
            docs.filter(F.col("doc_id") % 5 == 0),
            docs.filter(F.col("doc_id") % 5 != 0),
        )
    if name == "dedup_cc_clusters":
        from code_graph_rag_spark.operators.dedup import near_dup_clusters

        return near_dup_clusters(docs)
    if name == "dedup_lsh_candidates":
        from code_graph_rag_spark.operators.dedup import lsh_candidate_pairs

        return lsh_candidate_pairs(docs).orderBy("doc_a", "doc_b")
    if name == "dedup_simhash_pairs":
        from code_graph_rag_spark.operators.dedup import simhash_near_dups

        return simhash_near_dups(docs).orderBy("doc_a", "doc_b")
    return qs[name](spark, SF_DIR)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(cores=8, app_name="capture_plans")
    qs = entry.queries()
    for name in names:
        try:
            df = _lazy_frame(spark, name, qs)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"{name}: {len(txt)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
