"""End-to-end pipeline over a Rust corpus (the rs language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_rust_build oracle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    RUST_DOCS,
    RUST_EXPECTED,
    RUST_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

@pytest.fixture(scope="module")
def rust_graph(spark):
    docs = spark.createDataFrame(RUST_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_rust_expected_triples(rust_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in rust_graph.edges.select("subj", "pred", "obj").collect()
    }
    missing = RUST_EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_rust_exact_predicate_sets(rust_graph):
    """Exact equality on the whitelisted predicates — mirrors the
    kg_rust_build driver oracle."""
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in rust_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == RUST_EXPECTED, (
        f"extra={sorted(got - RUST_EXPECTED)} "
        f"missing={sorted(RUST_EXPECTED - got)}"
    )


def test_rust_forbidden_triples(rust_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in rust_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (RUST_FORBIDDEN & got), f"forbidden={sorted(RUST_FORBIDDEN & got)}"


def test_rust_audit_clean(rust_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(rust_graph.nodes, rust_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
