#!/usr/bin/env python
"""Per-query noop-sink isolation bench (guide §1.4) — bench.py stays frozen
for the driver; THIS file is the round-6 measurement harness for individual
operator legs.

Usage: python bench_extra.py [query ...]        (default: all bench legs)
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_RUNS (default 3)

Each leg: spark.sparkContext.setJobDescription(name); build the frame fresh
from parquet; noop-sink write (computes every column of every row, no sink
cost); report per-leg seconds (all runs, median, min). Same tuned session
as bench.py, one warmup action first.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def main() -> None:
    import __spark_entry__ as entry
    from bench import BENCH_QUERIES, _median
    from code_graph_rag_spark.session import get_spark

    names = sys.argv[1:] or BENCH_QUERIES
    spark = get_spark(cores=CPUS, app_name="bench_extra")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        secs = []
        for _ in range(RUNS):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            secs.append(round(time.time() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "all": secs,
            "median": round(_median(secs), 2),
            "min": round(min(secs), 2),
        }
        print(f"{name}: {secs} median={out[name]['median']}", flush=True)
    print("EXTRA " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
