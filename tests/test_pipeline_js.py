"""End-to-end pipeline over a JavaScript corpus (the js_ts language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_js_build oracle).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    JS_DOCS,
    JS_EXPECTED,
    JS_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

@pytest.fixture(scope="module")
def js_graph(spark):
    docs = spark.createDataFrame(JS_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_js_expected_triples(js_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in js_graph.edges.select("subj", "pred", "obj").collect()
    }
    missing = JS_EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_js_forbidden_triples(js_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in js_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (JS_FORBIDDEN & got), f"forbidden={sorted(JS_FORBIDDEN & got)}"


def test_js_precision_on_calls(js_graph):
    """Precision check: no unexpected CALLS/INSTANTIATES edges at all."""
    got = {
        (r.subj, r.pred, r.obj)
        for r in js_graph.edges.filter(
            F.col("pred").isin("CALLS", "INSTANTIATES")
        ).collect()
    }
    want = {t for t in JS_EXPECTED if t[1] in ("CALLS", "INSTANTIATES")}
    assert got == want, (
        f"extra={sorted(got - want)} missing={sorted(want - got)}"
    )


def test_js_audit_clean(js_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(js_graph.nodes, js_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
