"""End-to-end pipeline over a Dart corpus (the dart language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_dart_build oracle). Exercises: package-URI
imports, extends/implements clause fan-out with label-resolved split,
Dart 2+ new-less constructor calls (INSTANTIATES + ctor-typed locals),
expression-bodied members, abstract signatures as entities.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    DART_DOCS,
    DART_EXPECTED,
    DART_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def dart_graph(spark):
    docs = spark.createDataFrame(DART_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_dart_exact_predicate_sets(dart_graph):
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in dart_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == DART_EXPECTED, (
        f"extra={sorted(got - DART_EXPECTED)} "
        f"missing={sorted(DART_EXPECTED - got)}"
    )


def test_dart_forbidden_triples(dart_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in dart_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (DART_FORBIDDEN & got), f"forbidden={sorted(DART_FORBIDDEN & got)}"


def test_dart_audit_clean(dart_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(dart_graph.nodes, dart_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
