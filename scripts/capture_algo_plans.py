#!/usr/bin/env python
"""Capture .explain("formatted") for the graph-algo bench legs
(kg_pagerank_2k / kg_label_prop_2k / kg_triangles_2k / kg_degree_topk_2k)
over a small synthetic edge frame — plan SHAPE is data-independent, so
this stands in for the 2k-doc built graph without a 2-minute build.

Usage: capture_algo_plans.py <suffix>
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from code_graph_rag_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(cores=8, app_name="capture_algo_plans")
    edges = spark.createDataFrame(
        [("a", "CALLS", "b"), ("b", "CALLS", "c"), ("a", "CALLS", "c")],
        ["subj", "pred", "obj"],
    ).localCheckpoint(eager=True)
    # show the FULL iteration dataflow: the per-iteration lineage cuts
    # would otherwise hide every join/aggregate before the last checkpoint
    # (patch the CLASSIC class — pyspark.sql.DataFrame is the Spark 4
    # abstract base and the classic subclass overrides localCheckpoint)
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    _CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore

    from code_graph_rag_spark.plans.graph_algos import (
        degree_top,
        label_propagation,
        pagerank,
        triangle_counts,
    )

    frames = {
        "kg_pagerank_2k": pagerank(edges, iters=3),
        "kg_label_prop_2k": label_propagation(edges, iters=3),
        "kg_triangles_2k": triangle_counts(edges),
        "kg_degree_topk_2k": degree_top(edges, 25),
    }
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, df in frames.items():
        txt = df._jdf.queryExecution().explainString(mode)
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(f"{name}: {len(txt)} bytes", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
