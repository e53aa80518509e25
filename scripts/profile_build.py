#!/usr/bin/env python
"""Per-stage profile of one kg_build: stage timings (CGR_DEBUG_TIMING),
job counts per phase, and a split of the post-edges_prov tail
(nodes materialization vs edges dedup+phantom)."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("CGR_DEBUG_TIMING", "1")

DOCS = int(os.environ.get("PROF_DOCS", "20000"))
CORES = int(os.environ.get("PROF_CORES", "16"))


def njobs(sc) -> int:
    return len(sc.statusTracker().getJobIdsForGroup())


def main() -> None:
    from code_graph_rag_spark.fixtures import synth_corpus_distributed
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.session import get_spark

    spark = get_spark(cores=CORES, app_name=f"profile_{CORES}")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if os.environ.get("PROF_WARMUP"):
        # mirror bench.py: one untimed build warms one-off Catalyst
        # rule-init + Python-worker spin-up out of the profiled build
        wdocs = synth_corpus_distributed(spark, 100).persist()
        wdocs.count()
        wg = build_graph(wdocs)
        wg.edges.count()
        wg.unpersist()
        wdocs.unpersist()

    docs = synth_corpus_distributed(spark, DOCS).persist()
    docs.count()

    j0 = njobs(sc)
    t0 = time.time()
    g = build_graph(docs)
    t_build = time.time() - t0
    j_build = njobs(sc)

    t0 = time.time()
    n_nodes = g.nodes.count()
    t_nodes = time.time() - t0
    j_nodes = njobs(sc)

    t0 = time.time()
    n_edges = g.edges.count()
    t_edges = time.time() - t0
    j_edges = njobs(sc)

    print(
        f"PROFILE docs={DOCS} cores={CORES} "
        f"build_lazy={t_build:.1f}s({j_build - j0}j) "
        f"nodes={t_nodes:.1f}s({j_nodes - j_build}j,{n_nodes}) "
        f"edges={t_edges:.1f}s({j_edges - j_nodes}j,{n_edges}) "
        f"total={t_build + t_nodes + t_edges:.1f}s jobs={j_edges - j0}",
        flush=True,
    )
    g.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
