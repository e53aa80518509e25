"""Multi-hop taint closure (plans/taint.flow_closure) semantics.

Pins the operator against hand-computed expectations AND against the
DuckDB recursive-CTE oracle (closure_oracle_sql) on graphs chosen to
stress the equivalence argument: diamonds (lexicographic tie-break),
cycles (walk semantics / termination), and the max_hops bound.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.plans.taint import closure_oracle_sql, flow_closure


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(s, "FLOWS_TO", d) for s, d in pairs], "subj string, pred string, obj string"
    )


def _run(spark, pairs, max_hops=8):
    out = flow_closure(_edges(spark, pairs), max_hops=max_hops)
    return sorted(
        (r.src, r.dst, r.n_hops, r.path)
        for r in out.collect()
    )


def _oracle(pairs, max_hops=8):
    vals = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    rows = duckdb.sql(closure_oracle_sql(vals, max_hops=max_hops)).fetchall()
    return sorted(rows)


def test_chain(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, pairs)
    assert got == [
        ("a", "b", 1, "a -> b"),
        ("a", "c", 2, "a -> b -> c"),
        ("a", "d", 3, "a -> b -> c -> d"),
        ("b", "c", 1, "b -> c"),
        ("b", "d", 2, "b -> c -> d"),
        ("c", "d", 1, "c -> d"),
    ]
    assert got == _oracle(pairs)


def test_diamond_tiebreak(spark):
    # two 2-hop walks a->c; the lexicographically smaller node sequence wins
    pairs = [("a", "b2"), ("a", "b1"), ("b1", "c"), ("b2", "c")]
    got = dict(((s, d), (h, p)) for s, d, h, p in _run(spark, pairs))
    assert got[("a", "c")] == (2, "a -> b1 -> c")
    assert sorted((k + v for k, v in got.items())) == _oracle(pairs)


def test_shorter_hop_beats_smaller_path(spark):
    # a->z direct (1 hop) plus a lexicographically tiny 2-hop walk: hop
    # count is the primary key, so the direct edge is the representative
    pairs = [("a", "z"), ("a", "a1"), ("a1", "z")]
    got = dict(((s, d), (h, p)) for s, d, h, p in _run(spark, pairs))
    assert got[("a", "z")] == (1, "a -> z")
    assert sorted((k + v for k, v in got.items())) == _oracle(pairs)


def test_cycle_terminates_and_matches(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c")]
    got = _run(spark, pairs)
    # self-pairs appear at 2 hops (walk semantics); closure terminates
    assert ("a", "a", 2, "a -> b -> a") in got
    assert ("a", "c", 2, "a -> b -> c") in got
    assert got == _oracle(pairs)


def test_max_hops_bound(spark):
    pairs = [(f"n{i}", f"n{i + 1}") for i in range(6)]
    got = _run(spark, pairs, max_hops=3)
    assert max(h for _, _, h, _ in got) == 3
    assert got == _oracle(pairs, max_hops=3)


def test_dense_random_parity(spark):
    # deterministic pseudo-random digraph with shared hubs: many competing
    # equal-length walks, cycles, and unreachable islands
    pairs = sorted(
        {
            (f"v{(7 * i) % 13}", f"v{(5 * i + 3) % 13}")
            for i in range(26)
            if (7 * i) % 13 != (5 * i + 3) % 13
        }
    )
    assert _run(spark, pairs, max_hops=5) == _oracle(pairs, max_hops=5)


def test_flows_to_only(spark):
    df = spark.createDataFrame(
        [("a", "FLOWS_TO", "b"), ("b", "CALLS", "c")],
        "subj string, pred string, obj string",
    )
    out = flow_closure(df)
    assert sorted((r.src, r.dst) for r in out.collect()) == [("a", "b")]
