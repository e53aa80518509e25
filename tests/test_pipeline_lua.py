"""End-to-end pipeline over a Lua corpus (the lua language tier).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_lua_build oracle). Exercises: table-as-class
with colon methods, require-binding imports, the constructor
return-setmetatable pattern through the fn-return hop, and return-table
exports.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    LUA_DOCS,
    LUA_EXPECTED,
    LUA_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def lua_graph(spark):
    docs = spark.createDataFrame(LUA_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    yield g
    g.unpersist()


def test_lua_exact_predicate_sets(lua_graph):
    from code_graph_rag_spark.fixtures_lang import LANG_ORACLE_PREDS

    got = {
        (r.subj, r.pred, r.obj)
        for r in lua_graph.edges.filter(
            F.col("pred").isin(*LANG_ORACLE_PREDS)
        ).collect()
    }
    assert got == LUA_EXPECTED, (
        f"extra={sorted(got - LUA_EXPECTED)} "
        f"missing={sorted(LUA_EXPECTED - got)}"
    )


def test_lua_forbidden_triples(lua_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in lua_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (LUA_FORBIDDEN & got), f"forbidden={sorted(LUA_FORBIDDEN & got)}"


def test_lua_audit_clean(lua_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(lua_graph.nodes, lua_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
