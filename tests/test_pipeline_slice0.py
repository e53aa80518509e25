"""Slice-0 oracle: the reference's two-file CALLS integration test
(``codebase_rag/tests/test_graph_updater_integration.py:27-57``) reproduced
end-to-end on the Spark pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures import SLICE0_EXPECTED

from tests.conftest import triples


def test_expected_triples_present(slice0_graph):
    got = triples(slice0_graph)
    missing = SLICE0_EXPECTED - got
    assert not missing, f"missing triples: {missing}"


def test_no_spurious_call_edges(slice0_graph):
    calls = {
        (r.subj, r.obj)
        for r in slice0_graph.edges.filter(F.col("pred") == "CALLS").collect()
    }
    assert calls == {
        ("proj.main.main_func", "proj.utils.util_func"),
        ("proj.main.main_func", "proj.main.local_func"),
    }


def test_audit_invariants(slice0_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(slice0_graph.nodes, slice0_graph.edges)
    assert rep.ok, rep


def test_span_passthrough(spark):
    """Per-row invariant: extraction never reorders/drops/rewrites spans."""
    from code_graph_rag_spark.extract.mentions import extract_mentions
    from code_graph_rag_spark.fixtures import polyglot

    docs = polyglot(spark)
    before = {
        r.doc_id: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans
        ]
        for r in docs.collect()
    }
    extract_mentions(docs).count()  # runs extraction over the same frame
    after = {
        r.doc_id: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r.spans
        ]
        for r in docs.collect()
    }
    assert before == after


def test_flagship_query(spark, slice0_graph):
    """Read path: 'which functions call util_func' via Spark SQL."""
    slice0_graph.edges.createOrReplaceTempView("edges")
    rows = spark.sql(
        """
        SELECT subj FROM edges
        WHERE pred = 'CALLS' AND obj = 'proj.utils.util_func'
        ORDER BY subj
        """
    ).collect()
    assert [r.subj for r in rows] == ["proj.main.main_func"]
