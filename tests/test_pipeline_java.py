"""End-to-end pipeline over a Java corpus (the java language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_java_build oracle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    JAVA_DOCS,
    JAVA_EXPECTED,
    JAVA_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

@pytest.fixture(scope="module")
def java_graph(spark):
    docs = spark.createDataFrame(JAVA_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_java_expected_triples(java_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in java_graph.edges.select("subj", "pred", "obj").collect()
    }
    missing = JAVA_EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_java_exact_predicate_sets(java_graph):
    """On the whitelisted predicates the edge set must EQUAL the expected
    set — this is the same equality the kg_java_build driver oracle
    replays, so a drift shows up here first."""
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in java_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == JAVA_EXPECTED, (
        f"extra={sorted(got - JAVA_EXPECTED)} "
        f"missing={sorted(JAVA_EXPECTED - got)}"
    )


def test_java_forbidden_triples(java_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in java_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (JAVA_FORBIDDEN & got), f"forbidden={sorted(JAVA_FORBIDDEN & got)}"


def test_java_audit_clean(java_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(java_graph.nodes, java_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
