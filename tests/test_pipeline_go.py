"""End-to-end pipeline over a Go corpus (the go language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_go_build oracle). Exercises: package-dir
module collapse, receiver methods (the reference's deferred Go pass),
typed receivers (var decl / composite literal / param / fn-return hop),
case-based EXPORTS, and go.mod DEPENDS_ON_EXTERNAL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    GO_DOCS,
    GO_EXPECTED,
    GO_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def go_graph(spark):
    docs = spark.createDataFrame(GO_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_go_expected_triples(go_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in go_graph.edges.select("subj", "pred", "obj").collect()
    }
    missing = GO_EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_go_exact_predicate_sets(go_graph):
    """Exact equality on the whitelisted predicates — mirrors the
    kg_go_build driver oracle."""
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in go_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == GO_EXPECTED, (
        f"extra={sorted(got - GO_EXPECTED)} "
        f"missing={sorted(GO_EXPECTED - got)}"
    )


def test_go_forbidden_triples(go_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in go_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (GO_FORBIDDEN & got), f"forbidden={sorted(GO_FORBIDDEN & got)}"


def test_go_audit_clean(go_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(go_graph.nodes, go_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
