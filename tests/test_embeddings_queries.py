"""Entity embeddings + semantic search, prefix search, resolution stats,
dead-code exported roots."""

from __future__ import annotations


def test_embed_entities_shape_and_determinism(polyglot_graph):
    from code_graph_rag_spark.operators.embeddings import embed_entities

    emb = embed_entities(polyglot_graph.nodes, dim=32)
    rows = emb.collect()
    assert rows and all(len(r.embedding) == 32 for r in rows)
    ids = {r.entity_id for r in rows}
    assert "poly.shapes.Circle.area" in ids
    again = {r.entity_id: r.embedding for r in embed_entities(polyglot_graph.nodes, dim=32).collect()}
    assert again[rows[0].entity_id] == rows[0].embedding


def test_semantic_search_finds_entity(polyglot_graph):
    from code_graph_rag_spark.operators.embeddings import semantic_search

    top = semantic_search(polyglot_graph.nodes, "shapes circle area", k=5).collect()
    assert top, "no results"
    assert any("circle" in r.entity_id.lower() for r in top[:3])


def test_find_with_prefix(polyglot_graph):
    from code_graph_rag_spark.queries import find_with_prefix

    hits = {r.id for r in find_with_prefix(polyglot_graph.nodes, "poly.shapes.Circle").collect()}
    assert "poly.shapes.Circle" in hits
    assert "poly.shapes.Circle.area" in hits
    assert all(h.startswith("poly.shapes.Circle") for h in hits)


def test_resolution_stats_counts_drops(polyglot_graph):
    from code_graph_rag_spark.queries import resolution_stats

    stats = {
        r.kind: r
        for r in resolution_stats(
            polyglot_graph.mentions, polyglot_graph.resolved
        ).collect()
    }
    call = stats["call"]
    assert call.n_mentions == call.n_resolved + call.n_unresolved
    # the fixture has deliberate drop cases (requests.get, h.get, rebound c)
    assert call.n_unresolved >= 3
    assert call.n_resolved > 0


# NOTE: the __all__-exported-roots dead-code case lives in
# tests/test_queries_streaming.py::test_dead_code (folded into that
# corpus so the suite builds one graph fewer).


def test_reconcile_embeddings_cache_and_orphans(spark):
    """Content-hash reconciliation: unchanged entities reuse their stored
    vector (no encoder pass), changed ones re-embed, deleted ones drop
    (graph_updater.py:2051-2181 re-expressed as joins)."""
    from code_graph_rag_spark.operators.embeddings import reconcile_embeddings

    nodes_v1 = spark.createDataFrame(
        [
            ("Function", "p.a", "a"),
            ("Function", "p.b", "b"),
            ("Class", "p.C", "C"),
        ],
        "label string, id string, name string",
    )
    t1 = reconcile_embeddings(nodes_v1).collect()
    assert {r.src for r in t1} == {"fresh"} and len(t1) == 3
    stored = spark.createDataFrame(t1).drop("src")

    # identical graph → everything served from the cache
    t2 = reconcile_embeddings(nodes_v1, stored).collect()
    assert {r.src for r in t2} == {"cache"} and len(t2) == 3

    # rename b's name (content change), delete C, add d
    nodes_v2 = spark.createDataFrame(
        [
            ("Function", "p.a", "a"),
            ("Function", "p.b", "b2"),
            ("Function", "p.d", "d"),
        ],
        "label string, id string, name string",
    )
    t3 = {r.entity_id: r for r in reconcile_embeddings(nodes_v2, stored).collect()}
    assert t3["p.a"].src == "cache"
    assert t3["p.b"].src == "fresh"  # content changed → re-embedded
    assert t3["p.d"].src == "fresh"  # new entity
    assert "p.C" not in t3  # orphaned vector removed
    # cached vector is bit-identical to the original
    orig = {r.entity_id: r.embedding for r in t1}
    assert t3["p.a"].embedding == orig["p.a"]
