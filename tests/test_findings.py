"""Findings capture group: declarative line rules → Pattern/CodeSmell/
SecurityIssue nodes + finding edges, gated off by default (reference
analyzers/ast_grep_analyzer.py opt-in FINDINGS selection)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    FINDINGS_DOCS,
    FINDINGS_EXPECTED,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA

FINDING_PREDS = ("IMPLEMENTS_PATTERN", "HAS_SMELL", "HAS_VULNERABILITY")


@pytest.fixture(scope="module")
def findings_graph(spark):
    docs = spark.createDataFrame(FINDINGS_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("findings",))
    yield g
    g.unpersist()


def test_findings_exact_edges(findings_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in findings_graph.edges.filter(
            F.col("pred").isin(*FINDING_PREDS)
        ).collect()
    }
    assert got == FINDINGS_EXPECTED, (
        f"extra={sorted(got - FINDINGS_EXPECTED)} "
        f"missing={sorted(FINDINGS_EXPECTED - got)}"
    )


def test_finding_nodes_carry_site(findings_graph):
    rows = {
        r.id: r
        for r in findings_graph.nodes.filter(
            F.col("label").isin("Pattern", "CodeSmell", "SecurityIssue")
        ).collect()
    }
    assert set(rows) == {t[2] for t in FINDINGS_EXPECTED}
    n = rows["fproj.app.8.8.eval_call"]
    assert n.name == "eval_call"
    assert n.path == "fproj/app.py"
    assert n.start_line == 8
    assert '"message"' in n.props and "eval" in n.props


def test_findings_gated_off_by_default(spark):
    docs = spark.createDataFrame(FINDINGS_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    try:
        assert (
            g.edges.filter(F.col("pred").isin(*FINDING_PREDS)).count() == 0
        )
        assert (
            g.nodes.filter(
                F.col("label").isin("Pattern", "CodeSmell", "SecurityIssue")
            ).count()
            == 0
        )
    finally:
        g.unpersist()


def test_findings_audit_clean(findings_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(findings_graph.nodes, findings_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
