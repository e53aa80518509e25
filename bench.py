#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports the KG-construction throughput (triples/sec over a
deterministic synthetic interleaved-span corpus — BASELINE.json metric) and
a DEFAULT-ON local[N] vs local[4N] scaling block (sandbox stand-in for the
north rule's N vs 4N executors; 20k docs, 4 alternating legs per config;
SPARK_GRAFT_SCALING=0 to skip while iterating).
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
KG_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "2000"))

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "window_topk_orders",
    "agg_rollup_nation",
    "events_hourly",
    "events_sessionize",
    "text_quality",
    "text_langid",
    "dedup_exact_groups",
    "dedup_minhash_sigs",
    "dedup_lsh_candidates",
    "dedup_decontam",
    "dedup_cross_corpus",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "search_bm25_topk",
    "text_repetition",
    "dedup_cc_clusters",
    "events_asof_signup",
    "events_range_follow",
    "events_value_quantiles",
]


def _noop_write(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _js_module_doc(i: int, n_docs: int, funcs_per_doc: int, pkg_fanout: int) -> dict:
    """JS twin of fixtures._synth_module_doc — same call topology, ESM
    imports, class pair with override + this-dispatch. Exercises the jslite
    kernel + the shared join phase at bench scale."""
    p = i % pkg_fanout
    s1 = (i + 1) % n_docs
    s1p = s1 % pkg_fanout
    body = [
        f"import {{ fn_0 }} from '../pkg{s1p:03d}/mod{s1:05d}';\n",
        f"class B{i % 7} {{\n  run() {{ return 0; }}\n  step() {{ return 1; }}\n}}\n",
        f"class C{i % 97} extends B{i % 7} {{\n"
        "  run() { return this.step(); }\n  step() { return 1; }\n}\n",
    ]
    for f_i in range(funcs_per_doc):
        callee = f"fn_{(f_i + 1) % funcs_per_doc}"
        body.append(
            f"export function fn_{f_i}() {{\n"
            f"  {callee}();\n  fn_0();\n"
            f"  const c = new C{i % 97}();\n  return c;\n}}\n"
        )
    text = "".join(body)
    return {
        "doc_id": f"jsbench/pkg{p:03d}/mod{i:05d}.js",
        "spans": [{"kind": "code", "text": text, "media_ref": "", "offset": 0}],
    }


def js_corpus(spark, n_docs: int, funcs_per_doc: int = 6, pkg_fanout: int = 40):
    """Deterministic JS bench corpus, generated on the executors."""
    import pandas as pd

    from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

    n_parts = spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [
                _js_module_doc(int(i), n_docs, funcs_per_doc, pkg_fanout)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return spark.range(0, n_docs, 1, n_parts).mapInPandas(
        gen, schema=DOCUMENTS_SCHEMA
    )


RUNS = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_bench(
    cores: int,
    include_queries: bool = True,
    kg_docs: int = KG_DOCS,
    runs: int = RUNS,
) -> dict:
    """Each leg runs ``runs`` times; the reported figure is the MEDIAN (the
    per-leg min is also emitted). Single-shot numbers on this box are noise
    — documented ±25 % and observed ~5× swings from VM CPU steal /
    concurrent sessions — so one contaminated execution must not be able to
    masquerade as a code regression."""
    from code_graph_rag_spark.fixtures import synth_corpus_distributed
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(cores=cores, app_name=f"bench_{cores}")
    # warm the JVM/Python workers so measurements are steady-state
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # one small UNTIMED build: the first build in a session pays one-off
    # Catalyst rule-initialization + Python-worker spin-up (measured ~2x the
    # steady-state build at 2k docs) that a long-lived cluster job never
    # sees again — warm it out of the timed legs
    wdocs = synth_corpus_distributed(spark, 100).persist()
    wdocs.count()
    wg = build_graph(wdocs)
    wg.edges.count()
    wg.unpersist()
    wdocs.unpersist()

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}

    def leg(name: str, fn) -> None:
        secs = []
        for _ in range(runs):
            t0 = time.time()
            fn()
            secs.append(time.time() - t0)
        timings[name] = round(_median(secs), 2)
        timings_min[name] = round(min(secs), 2)

    # --- KG construction throughput (the BASELINE.json metric) ---
    # corpus generated on executors and persisted BEFORE timing starts, so
    # kg_build measures the engine only
    docs = synth_corpus_distributed(spark, kg_docs).persist()
    n_docs = docs.count()
    n_triples = 0

    last_g = None

    def kg_leg():
        nonlocal n_triples, last_g
        if last_g is not None:
            last_g.unpersist()
        g = build_graph(docs)
        n_triples = g.edges.count()
        last_g = g

    leg("kg_build", kg_leg)
    docs.unpersist()

    # --- whole-graph analytics over the 2k-doc built graph (~93k triples):
    # PageRank (3 power iterations), degree-oriented triangle counting,
    # degree top-k — the metrics a graph warehouse computes post-build ---
    if last_g is not None:
        if include_queries:
            from code_graph_rag_spark.plans.graph_algos import (
                degree_top,
                label_propagation,
                pagerank,
                triangle_counts,
            )

            edges = last_g.edges
            leg("kg_pagerank_2k", lambda: _noop_write(pagerank(edges, iters=3)))
            leg("kg_triangles_2k", lambda: _noop_write(triangle_counts(edges)))
            leg("kg_degree_topk_2k", lambda: _noop_write(degree_top(edges, 25)))
            leg(
                "kg_label_prop_2k",
                lambda: _noop_write(label_propagation(edges, iters=3)),
            )
        last_g.unpersist()

    # --- JS-tier throughput: same topology through the jslite kernel ---
    if include_queries:
        jdocs = js_corpus(spark, max(kg_docs // 2, 100)).persist()
        jdocs.count()

        def js_leg():
            jg = build_graph(jdocs)
            jg.edges.count()
            jg.unpersist()

        leg("kg_build_js", js_leg)
        jdocs.unpersist()

        qs = entrymod.queries()
        for name in BENCH_QUERIES:
            leg(name, lambda name=name: _noop_write(qs[name](spark, SF_DIR)))

    spark.stop()
    return {
        "cores": cores,
        "runs": runs,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "kg_secs": timings["kg_build"],
        "triples_per_sec": round(n_triples / timings["kg_build"], 1),
        "queries": timings,
        "queries_min": timings_min,
    }


def main() -> None:
    result = run_bench(CPUS)
    total = round(sum(result["queries"].values()), 2)
    out = {
        "metric": "triples_per_sec_kg_build",
        "value": result["triples_per_sec"],
        "unit": "triples/sec",
        "queries": result["queries"],
        "queries_min": result["queries_min"],
        "runs": result["runs"],
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "total_query_sec": total,
        "n_triples": result["n_triples"],
        "kg_docs": result["n_docs"],
        "cores": CPUS,
    }
    # Scaling block is DEFAULT-ON (r4 VERDICT #3): the driver runs bench.py
    # bare, and BENCH_r{N}.json must carry the north-rule two-cluster-size
    # evidence: 20k docs, 4 alternating fresh-subprocess legs per config,
    # min per config (adds ~10-15 min). "0" -> skip (iterating on the
    # query legs only).
    _scaling_mode = os.environ.get("SPARK_GRAFT_SCALING", "small")
    if _scaling_mode != "0":
        # the two-cluster-size criterion: identical input, N vs 4N cores.
        # Measured at a corpus size where per-stage fixed cost is amortized
        # (at 2k docs the ~25-30 s of stage/setup overhead dominates and
        # MORE cores lose — that measures the harness, not the engine), and
        # each leg in a FRESH SUBPROCESS: back-to-back sessions in one JVM
        # contaminate each other (measured 3x degradation on the second).
        #
        # Default pair is 4 vs 16 (not 8 vs 32): this VM cannot deliver 4x
        # from its upper cores — a pure whole-stage-codegen range-sum (no
        # shuffle, no Python) measures only ~2.5x from 8->32 threads and
        # ~3.1x from 4->16 (frequency scaling / hypervisor overcommit), so
        # any job's 8->32 "efficiency" is capped at ~0.6 by the box alone.
        # The same ideal-workload probe runs at both leg sizes and its
        # speedup is reported as `ideal_speedup` — the box's achievable
        # ceiling for a perfectly parallel job — alongside
        # `normalized_efficiency` = engine speedup / ideal speedup, the
        # engine's share of the parallelism the hardware actually offers.
        import subprocess

        # 20k docs keeps a leg at 1-5 min: short enough that 3 alternating
        # runs sample different box-noise windows (the host shows 3x
        # time-varying contention; one 60k run measured every leg — engine
        # AND ideal probe — uniformly 3x slower than the same code an hour
        # earlier), long enough that the ~40 s fixed stage cost is <half
        # of the small leg. The min per config is the least-contaminated
        # observation.
        # small mode measures the same 20k-doc regime as full: at 10k docs
        # the ~35 s core-count-independent join phase is most of the leg and
        # the block measures the fixed cost, not the engine's scaling
        sdocs = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "20000"))
        # 4 alternating runs per config: round-5 event logs measured a 48x
        # same-stage spread across contention windows at 16 threads, and
        # one full 3-run block landed with ALL SIX legs inflated 2.5-4x —
        # more alternating rounds = more chances that each config samples
        # a quiet window before the min is taken
        s_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "4"))
        pair = os.environ.get("SPARK_GRAFT_SCALING_CORES", "4,16")
        small_cores, big_cores = (int(x) for x in pair.split(","))

        def ideal_leg(cores: int) -> tuple[float, float]:
            # two perfectly-parallel baselines measured in one JVM:
            # (a) codegen'd range-sum — zero shuffle, zero memory traffic —
            #     the box's pure-CPU thread ceiling; and
            # (b) a shuffle probe (200M rows → 1M-key exchange + hash agg)
            #     — memory-bandwidth/shuffle-bound like the engine's join
            #     stages. The host's time-varying contention melts
            #     16-thread MEMORY-bound work specifically (BASELINE.md:
            #     48× same-stage spread) while barely touching (a), so (b)
            #     is the ceiling the engine should be normalized against in
            #     a contended window; on a quiet box the two agree.
            code = (
                "import sys, time; sys.path.insert(0, "
                f"{str(Path(__file__).resolve().parent)!r}); "
                "from code_graph_rag_spark.session import get_spark; "
                f"s = get_spark(cores={cores}, app_name='ideal{cores}'); "
                "s.range(10_000_000).selectExpr('sum(id)').collect(); "
                "t0 = time.time(); "
                f"s.range(0, 40_000_000_000, 1, {cores})"
                ".selectExpr('sum(id % 1000)').collect(); "
                "print('IDEAL', time.time() - t0); "
                "t0 = time.time(); "
                f"s.range(0, 200_000_000, 1, {cores})"
                ".selectExpr('id % 1000000 as k').groupBy('k').count()"
                ".selectExpr('sum(`count`) as n').collect(); "
                "print('IDEALSHUF', time.time() - t0)"
            )
            p = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True
            )
            cpu = shuf = None
            for ln in p.stdout.splitlines():
                if ln.startswith("IDEAL "):
                    cpu = float(ln[6:])
                elif ln.startswith("IDEALSHUF "):
                    shuf = float(ln[10:])
            if cpu is None or shuf is None:
                raise RuntimeError(p.stderr[-800:])
            return cpu, shuf

        def leg(cores: int) -> dict:
            code = (
                "import sys, json; sys.path.insert(0, "
                f"{str(Path(__file__).resolve().parent)!r}); "
                "from bench import run_bench; "
                f"print('LEG', json.dumps(run_bench({cores}, "
                f"include_queries=False, kg_docs={sdocs}, runs=1)))"
            )
            p = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True
            )
            for ln in p.stdout.splitlines():
                if ln.startswith("LEG "):
                    return json.loads(ln[4:])
            raise RuntimeError(p.stderr[-800:])

        # ALTERNATING leg order with per-config MIN: running all of one
        # config back-to-back bakes box-noise drift into the comparison
        # (measured: a 32-core leg right after the main bench read 216 s
        # vs 45 s isolated). Each leg is a fresh subprocess; the min is
        # the least-contaminated observation of each configuration on a
        # steal-prone VM.
        times: dict[int, list[float]] = {big_cores: [], small_cores: []}
        ideal_times: dict[int, list[float]] = {big_cores: [], small_cores: []}
        shuf_times: dict[int, list[float]] = {big_cores: [], small_cores: []}
        n_triples_by: dict[int, int] = {}
        # wall budget: in a contended window a 20k engine leg can run 3-4x
        # long; stop sampling after this many seconds once >=2 full rounds
        # are in (keeps the whole bench bounded for the driver while still
        # taking all 4 rounds in normal windows)
        s_budget = int(os.environ.get("SPARK_GRAFT_SCALING_BUDGET_S", "1500"))
        t_block0 = time.time()
        rounds_done = 0
        for _ in range(s_runs):
            for cores in (big_cores, small_cores):
                r = leg(cores)
                times[cores].append(r["queries_min"]["kg_build"])
                n_triples_by[cores] = r["n_triples"]
                cpu_s, shuf_s = ideal_leg(cores)
                ideal_times[cores].append(cpu_s)
                shuf_times[cores].append(shuf_s)
            rounds_done += 1
            if rounds_done >= 2 and time.time() - t_block0 > s_budget:
                break
        t_big = min(times[big_cores])
        t_small = min(times[small_cores])
        speedup = t_small / t_big
        ideal_speedup = min(ideal_times[small_cores]) / min(
            ideal_times[big_cores]
        )
        shuf_speedup = min(shuf_times[small_cores]) / min(
            shuf_times[big_cores]
        )
        ratio = big_cores / small_cores
        out["scaling"] = {
            "kg_docs": sdocs,
            "runs_per_leg": rounds_done,
            "leg_order": "alternating",
            "cores_small": small_cores,
            "cores_large": big_cores,
            "kg_secs_small": t_small,
            "kg_secs_large": t_big,
            "kg_secs_all": {str(k): v for k, v in times.items()},
            "triples_per_sec_small": round(
                n_triples_by[small_cores] / t_small, 1
            ),
            "triples_per_sec_large": round(n_triples_by[big_cores] / t_big, 1),
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / ratio, 3),
            # box ceiling: the same N-vs-4N pair on a perfectly parallel
            # codegen range-sum (no shuffle, no Python, no engine code)
            "ideal_speedup": round(ideal_speedup, 3),
            "ideal_efficiency": round(ideal_speedup / ratio, 3),
            "ideal_secs_all": {
                str(k): [round(x, 2) for x in v]
                for k, v in ideal_times.items()
            },
            "normalized_efficiency": round(speedup / ideal_speedup, 3),
            # memory-bound ceiling: the same pair on the shuffle probe —
            # the apples-to-apples ceiling for the engine's shuffle/agg
            # stages in a contended window (see ideal_leg)
            "shuffle_ideal_speedup": round(shuf_speedup, 3),
            "shuffle_ideal_secs_all": {
                str(k): [round(x, 2) for x in v]
                for k, v in shuf_times.items()
            },
            "normalized_efficiency_membound": round(
                speedup / shuf_speedup, 3
            ),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
