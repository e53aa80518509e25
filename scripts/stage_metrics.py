#!/usr/bin/env python
"""Event-log decomposition of one kg_build: per-_materialize-boundary job
groups, with summed task metrics (run time, GC, deser, scheduler delay,
task count) so anti-scaling stages can be attributed to a cause instead of
guessed at. Usage: PROF_CORES=16 PROF_DOCS=20000 python scripts/stage_metrics.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOCS = int(os.environ.get("PROF_DOCS", "20000"))
CORES = int(os.environ.get("PROF_CORES", "16"))
EVDIR = "/tmp/spark-events"


def main() -> None:
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from code_graph_rag_spark.fixtures import synth_corpus_distributed
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.session import get_spark

    spark = get_spark(
        cores=CORES,
        app_name=f"stagemetrics_{CORES}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = synth_corpus_distributed(spark, DOCS).persist()
    docs.count()

    sc.setJobGroup("build", "build")
    t0 = time.time()
    g = build_graph(docs)
    sc.setJobGroup("nodes", "nodes")
    g.nodes.count()
    sc.setJobGroup("edges", "edges")
    g.edges.count()
    wall = time.time() - t0
    g.unpersist()
    spark.stop()

    # ---- parse the event log ----
    ev_files = [p for p in Path(EVDIR).rglob("*") if p.is_file()]
    job_group: dict[int, str] = {}
    stage_to_job: dict[int, int] = {}
    agg = defaultdict(lambda: defaultdict(float))
    per_stage = defaultdict(lambda: defaultdict(float))
    stage_names: dict[int, str] = {}
    for evf in ev_files:
        with open(evf) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = e.get("Event")
                if et == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    grp = e.get("Properties", {}).get(
                        "spark.jobGroup.id", ""
                    ) or "pre"
                    job_group[jid] = grp
                    for sid in e.get("Stage IDs", []):
                        stage_to_job[sid] = jid
                elif et == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    jid = stage_to_job.get(sid, -1)
                    grp = job_group.get(jid, "?")
                    tm = e.get("Task Metrics") or {}
                    ti = e.get("Task Info") or {}
                    for key, field in (
                        ("run_ms", "Executor Run Time"),
                        ("gc_ms", "JVM GC Time"),
                        ("deser_ms", "Executor Deserialize Time"),
                        ("cpu_ns", "Executor CPU Time"),
                        ("rser_ms", "Result Serialization Time"),
                    ):
                        agg[grp][key] += tm.get(field, 0)
                        per_stage[sid][key] += tm.get(field, 0)
                    launch = ti.get("Launch Time", 0)
                    finish = ti.get("Finish Time", 0)
                    dur = finish - launch
                    sched = dur - tm.get("Executor Run Time", 0) - tm.get(
                        "Executor Deserialize Time", 0
                    ) - tm.get("Result Serialization Time", 0)
                    agg[grp]["sched_ms"] += max(sched, 0)
                    per_stage[sid]["sched_ms"] += max(sched, 0)
                    agg[grp]["n_tasks"] += 1
                    per_stage[sid]["n_tasks"] += 1
                    per_stage[sid]["grp"] = grp  # type: ignore[assignment]
                elif et == "SparkListenerStageSubmitted":
                    si = e.get("Stage Info", {})
                    stage_names[si.get("Stage ID", -1)] = si.get(
                        "Stage Name", ""
                    )[:60]

    print(f"\nSTAGEMETRICS docs={DOCS} cores={CORES} wall={wall:.1f}s")
    for grp, m in sorted(agg.items()):
        print(
            f"  group={grp:<8} tasks={int(m['n_tasks']):>5} "
            f"run={m['run_ms'] / 1000:>7.1f}s cpu={m['cpu_ns'] / 1e9:>7.1f}s "
            f"gc={m['gc_ms'] / 1000:>6.1f}s deser={m['deser_ms'] / 1000:>6.1f}s "
            f"sched={m['sched_ms'] / 1000:>6.1f}s"
        )
    # top stages by run time
    top = sorted(
        per_stage.items(), key=lambda kv: -kv[1]["run_ms"]
    )[:15]
    print("  -- top stages by summed task run time --")
    for sid, m in top:
        print(
            f"  stage={sid:>4} grp={m.get('grp', '?'):<6} "
            f"tasks={int(m['n_tasks']):>4} run={m['run_ms'] / 1000:>7.1f}s "
            f"gc={m['gc_ms'] / 1000:>5.1f}s deser={m['deser_ms'] / 1000:>5.1f}s "
            f"sched={m['sched_ms'] / 1000:>6.1f}s  {stage_names.get(sid, '')}"
        )


if __name__ == "__main__":
    main()
