#!/usr/bin/env python
"""A/B the kg_build leg at bench configuration (local[32], 2k docs) between
stage-submission policies / arbitrary env overrides.

Each leg runs bench.run_bench(cores, include_queries=False) in a FRESH
subprocess (one Spark session per measurement — the round-2 rule), legs
alternate A,B,A,B,... so both configs sample the same box-noise windows,
and the per-config MIN is the least-contaminated observation.

Usage:
    python scripts/ab_kgbuild.py [rounds] [docs] [cores]
        A = current default (concurrent stage submission)
        B = CGR_SEQUENTIAL_STAGES=1
    Override the B-side env via AB_ENV_B='{"K": "V", ...}' (JSON) and the
    A-side via AB_ENV_A.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)


def leg(cores: int, docs: int, env_over: dict[str, str]) -> dict:
    code = (
        "import sys, json; sys.path.insert(0, "
        f"{REPO!r}); "
        "from bench import run_bench; "
        f"print('LEG', json.dumps(run_bench({cores}, "
        f"include_queries=False, kg_docs={docs}, runs=1)))"
    )
    env = dict(os.environ)
    env.pop("CGR_SEQUENTIAL_STAGES", None)
    env.update(env_over)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for ln in p.stdout.splitlines():
        if ln.startswith("LEG "):
            return json.loads(ln[4:])
    raise RuntimeError(p.stderr[-1500:])


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    env_a = json.loads(os.environ.get("AB_ENV_A", "{}"))
    env_b = json.loads(
        os.environ.get("AB_ENV_B", '{"CGR_SEQUENTIAL_STAGES": "1"}')
    )
    a_times: list[float] = []
    b_times: list[float] = []
    for r in range(rounds):
        for tag, env_over, acc in (
            ("A", env_a, a_times),
            ("B", env_b, b_times),
        ):
            res = leg(cores, docs, env_over)
            t = res["queries_min"]["kg_build"]
            acc.append(t)
            print(
                f"round {r} leg {tag} env={env_over}: kg_build={t:.2f}s "
                f"(n_triples={res['n_triples']})",
                flush=True,
            )
    print(
        json.dumps(
            {
                "docs": docs,
                "cores": cores,
                "A": a_times,
                "B": b_times,
                "A_min": min(a_times),
                "B_min": min(b_times),
                "A_env": env_a,
                "B_env": env_b,
            }
        )
    )


if __name__ == "__main__":
    main()
