"""Graph-analytics operators vs hand-computed / pure-Python twins."""

from __future__ import annotations

import pytest

from code_graph_rag_spark.plans.graph_algos import (
    degree_top,
    pagerank,
    triangle_counts,
)

# A small directed multigraph with known structure:
#   triangle {a, b, c} (directions mixed), a spoke d→a, a self-loop e→e,
#   a parallel edge a→b under a second predicate, and an isolated edge f→g.
EDGES = [
    ("a", "CALLS", "b"),
    ("a", "DEFINES", "b"),  # parallel edge: degree counts it, simple graph doesn't
    ("b", "CALLS", "c"),
    ("c", "CALLS", "a"),
    ("d", "CALLS", "a"),
    ("e", "CALLS", "e"),  # self-loop: dropped everywhere except degree
    ("f", "CALLS", "g"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["subj", "pred", "obj"])


def test_degree_top(edges_df):
    rows = {r["node"]: r for r in degree_top(edges_df, k=10).collect()}
    # a: out 2 (a→b ×2), in 2 (c→a, d→a) — degree 4
    assert (rows["a"]["out_deg"], rows["a"]["in_deg"], rows["a"]["degree"]) == (2, 2, 4)
    assert (rows["b"]["out_deg"], rows["b"]["in_deg"], rows["b"]["degree"]) == (1, 2, 3)
    # self-loop counts one out and one in
    assert (rows["e"]["out_deg"], rows["e"]["in_deg"], rows["e"]["degree"]) == (1, 1, 2)
    top = degree_top(edges_df, k=1).collect()
    assert [r["node"] for r in top] == ["a"]


def test_degree_top_tiebreak_and_k(edges_df):
    got = [r["node"] for r in degree_top(edges_df, k=10).collect()]
    # f and g tie at degree 1 → node-asc order
    assert got.index("f") < got.index("g")
    assert len(degree_top(edges_df, k=3).collect()) == 3


def _pagerank_twin(links, iters, d=0.85, extra_nodes=()):
    """Pure-Python twin of the documented recurrence (simple digraph;
    self-loop-only nodes enter the node set but contribute no links)."""
    nodes = sorted({x for e in links for x in e} | set(extra_nodes))
    n = len(nodes)
    out = {}
    for s, t in links:
        out.setdefault(s, set()).add(t)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        nxt = {v: (1.0 - d) / n for v in nodes}
        for s, ts in out.items():
            share = rank[s] / len(ts)
            for t in ts:
                nxt[t] += d * share
        rank = nxt
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_matches_twin(edges_df):
    links = {(s, o) for s, _, o in EDGES if s != o}
    loops = {s for s, _, o in EDGES if s == o}
    expected = _pagerank_twin(sorted(links), iters=3, extra_nodes=loops)
    got = {r["node"]: r["pagerank"] for r in pagerank(edges_df, iters=3).collect()}
    assert set(got) == set(expected)
    for v in expected:
        assert got[v] == pytest.approx(expected[v], abs=2e-6), v


def test_pagerank_self_loop_node_present(edges_df):
    got = {r["node"] for r in pagerank(edges_df, iters=1).collect()}
    assert "e" in got  # self-loop-only node still gets the teleport mass


def test_triangle_counts(edges_df):
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges_df).collect()}
    # exactly one triangle {a, b, c}; parallel edge and directions collapse
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_two_triangles(spark):
    # K4 minus one edge = 2 triangles sharing edge {a, b}
    e = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    df = spark.createDataFrame(
        [(s, "CALLS", t) for s, t in e], ["subj", "pred", "obj"]
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}
