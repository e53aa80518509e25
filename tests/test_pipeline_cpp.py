"""End-to-end pipeline over a C++ corpus (the cpp language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_cpp_build oracle). Exercises: the DEFERRED
out-of-class method pass (Ret Cls::name bodies in the .cpp bind to the
header's class across the basename-collision module split), header
declarations as entities, include resolution in both the collision and
plain forms, pointer/auto/declared receivers, and this-> dispatch in
out-of-class bodies.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    CPP_DOCS,
    CPP_EXPECTED,
    CPP_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def cpp_graph(spark):
    docs = spark.createDataFrame(CPP_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_cpp_exact_predicate_sets(cpp_graph):
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in cpp_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == CPP_EXPECTED, (
        f"extra={sorted(got - CPP_EXPECTED)} "
        f"missing={sorted(CPP_EXPECTED - got)}"
    )


def test_cpp_forbidden_triples(cpp_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in cpp_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (CPP_FORBIDDEN & got), f"forbidden={sorted(CPP_FORBIDDEN & got)}"


def test_cpp_audit_clean(cpp_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(cpp_graph.nodes, cpp_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
