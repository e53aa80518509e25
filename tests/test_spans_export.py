"""Span-containment range join + graph export round-trip."""

from __future__ import annotations

import shutil
import tempfile


def test_tightest_containing_span(spark):
    from code_graph_rag_spark.plans.spans import tightest_containing_span

    defs = spark.createDataFrame(
        [
            ("d1", "mod", 1, 100),
            ("d1", "mod.outer", 10, 50),
            ("d1", "mod.outer.inner", 20, 30),
            ("d2", "other", 1, 10),
        ],
        "doc_id string, def_qn string, start_line int, end_line int",
    )
    uses = spark.createDataFrame(
        [
            ("d1", "u1", 25),  # inside inner → tightest = inner
            ("d1", "u2", 40),  # inside outer only
            ("d1", "u3", 5),  # module level
            ("d1", "u4", 200),  # outside everything → dropped
            ("d2", "u5", 3),
        ],
        "doc_id string, use_id string, line int",
    )
    got = {
        r.use_id: r.def_qn
        for r in tightest_containing_span(uses, defs).collect()
    }
    assert got == {
        "u1": "mod.outer.inner",
        "u2": "mod.outer",
        "u3": "mod",
        "u5": "other",
    }


def test_location_join(spark):
    from code_graph_rag_spark.plans.spans import location_join

    defs = spark.createDataFrame(
        [("d1", "f", 3, 4, "mod.f")],
        "doc_id string, name string, start_line int, start_col int, def_qn string",
    )
    facts = spark.createDataFrame(
        [("d1", 3, 4, "overload#2"), ("d1", 9, 9, "miss")],
        "doc_id string, line int, col int, fact string",
    )
    rows = location_join(facts, defs).collect()
    assert [(r.fact, r.def_qn) for r in rows] == [("overload#2", "mod.f")]


def test_export_import_roundtrip(spark, slice0_graph):
    from code_graph_rag_spark.export import export_graph, import_graph

    out = tempfile.mkdtemp(prefix="cgr_export_")
    meta = export_graph(slice0_graph.nodes, slice0_graph.edges, out)
    assert meta["node_count"] == slice0_graph.nodes.count()
    nodes2, edges2 = import_graph(spark, out)
    orig_edges = {(r.subj, r.pred, r.obj) for r in slice0_graph.edges.collect()}
    back_edges = {(r.subj, r.pred, r.obj) for r in edges2.collect()}
    assert orig_edges == back_edges
    assert {(r.label, r.id) for r in nodes2.collect()} == {
        (r.label, r.id) for r in slice0_graph.nodes.collect()
    }
    shutil.rmtree(out, ignore_errors=True)


def test_media_span_attribution(polyglot_graph):
    """Interleaved media spans flow through tightest_containing_span in the
    pipeline: an asset inside a function body attaches to the function; one
    between top-level definitions falls back to the module."""
    rows = {
        (r.subj, r.obj)
        for r in polyglot_graph.edges.filter(
            polyglot_graph.edges.pred == "HAS_MEDIA"
        ).collect()
    }
    assert ("poly.media.render_doc", "assets/inline-figure.png") in rows
    assert ("poly.shapes", "assets/shape-diagram.png") in rows
    assert len(rows) == 2
