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


def test_dead_code_exported_roots(spark):
    """__all__-exported symbols are roots: a public API with no internal
    caller is alive (dead_code.py exported-symbol roots)."""
    from code_graph_rag_spark.pipeline import build_graph
    from code_graph_rag_spark.queries import dead_code
    from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

    src = (
        "__all__ = ['api']\n\n"
        "def api():\n    pass\n\n"
        "def internal_unused():\n    pass\n"
    )
    docs = spark.createDataFrame(
        [{"doc_id": "pub/lib.py",
          "spans": [{"kind": "code", "text": src, "media_ref": "", "offset": 0}]}],
        schema=DOCUMENTS_SCHEMA,
    )
    g = build_graph(docs)
    dead = {r.id for r in dead_code(g.nodes, g.edges).collect()}
    assert "pub.lib.api" not in dead
    assert "pub.lib.internal_unused" in dead
    g.unpersist()
