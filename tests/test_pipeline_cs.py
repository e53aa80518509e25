"""End-to-end pipeline over a C# corpus (the csharp language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_cs_build oracle). Exercises: Allman braces,
file-scoped namespaces, the single base list splitting INHERITS vs
IMPLEMENTS on the resolved label, using-namespace imports verifying to
the Package, typed locals / var-new / params, expression-bodied members,
and the unique-simple-name receiver rung (C# has no per-name import
binding for `using NS;`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    CS_DOCS,
    CS_EXPECTED,
    CS_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def cs_graph(spark):
    docs = spark.createDataFrame(CS_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_cs_exact_predicate_sets(cs_graph):
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in cs_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == CS_EXPECTED, (
        f"extra={sorted(got - CS_EXPECTED)} "
        f"missing={sorted(CS_EXPECTED - got)}"
    )


def test_cs_forbidden_triples(cs_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in cs_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (CS_FORBIDDEN & got), f"forbidden={sorted(CS_FORBIDDEN & got)}"


def test_cs_audit_clean(cs_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(cs_graph.nodes, cs_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
