"""End-to-end pipeline over a Ruby corpus (the ruby language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_ruby_build oracle). Exercises: nested
module/class containment, `class Sub < Base`, attr_accessor-minted
methods, verified require_relative vs external require, the
enclosing-scope and unique-simple-name call rungs, paren-less `X.new`
instantiation, and the Gemfile manifest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    RUBY_DOCS,
    RUBY_EXPECTED,
    RUBY_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def ruby_graph(spark):
    docs = spark.createDataFrame(RUBY_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_ruby_exact_predicate_sets(ruby_graph):
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in ruby_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == RUBY_EXPECTED, (
        f"extra={sorted(got - RUBY_EXPECTED)} "
        f"missing={sorted(RUBY_EXPECTED - got)}"
    )


def test_ruby_forbidden_triples(ruby_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in ruby_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (RUBY_FORBIDDEN & got), (
        f"forbidden={sorted(RUBY_FORBIDDEN & got)}"
    )


def test_ruby_audit_clean(ruby_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(ruby_graph.nodes, ruby_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
