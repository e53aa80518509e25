"""String-keyed dispatch registries (plans/dispatch.py; reference
parsers/dispatch_registry.py, issue #913).

Corpus + expected sets live in code_graph_rag_spark.fixtures_lang (shared
with the driver contract kg_dispatch oracle). Exercises: dict registries
(local + imported handler, the all-or-nothing gate), bare/named/
non-literal registrar decorators, registrar shadowing, literal /
module-constant / deployment-suffixed producers, module-level producer
scope, and deployment-suffix RESOLVES_TO.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures_lang import (
    DISPATCH_DOCS,
    DISPATCH_EXPECTED,
    DISPATCH_FORBIDDEN,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA


@pytest.fixture(scope="module")
def dispatch_graph(spark):
    docs = spark.createDataFrame(DISPATCH_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs, groups=DEFAULT_GROUPS + ("io",))
    yield g
    g.unpersist()


def _dispatch_rows(g):
    return {
        (r.subj, r.pred, r.obj)
        for r in g.edges.filter(
            F.col("pred").isin("EXPOSES", "WRITES_TO", "RESOLVES_TO")
            & (
                F.col("obj").startswith("resource::DISPATCH::")
                | F.col("subj").startswith("resource::DISPATCH::")
            )
        ).collect()
    }


def test_dispatch_exact_set(dispatch_graph):
    got = _dispatch_rows(dispatch_graph)
    assert got == DISPATCH_EXPECTED, (
        f"extra={sorted(got - DISPATCH_EXPECTED)} "
        f"missing={sorted(DISPATCH_EXPECTED - got)}"
    )


def test_dispatch_forbidden(dispatch_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in dispatch_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (DISPATCH_FORBIDDEN & got), (
        f"forbidden={sorted(DISPATCH_FORBIDDEN & got)}"
    )


def test_dispatch_resource_nodes_minted(dispatch_graph):
    nodes = {
        (r.label, r.id, r.name)
        for r in dispatch_graph.nodes.filter(
            F.col("id").startswith("resource::DISPATCH::")
        ).collect()
    }
    # name = the bare key (reference _ensure_resource)
    assert ("Resource", "resource::DISPATCH::ingest", "ingest") in nodes
    assert (
        "Resource",
        "resource::DISPATCH::daily-report/prod",
        "daily-report/prod",
    ) in nodes


def test_dispatch_off_by_default(spark):
    # the io capture group gates dispatch (reference: rel_enabled checks)
    docs = spark.createDataFrame(DISPATCH_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    try:
        n = g.edges.filter(
            F.col("obj").startswith("resource::DISPATCH::")
        ).count()
        assert n == 0
    finally:
        g.unpersist()


def test_dispatch_audit_clean(dispatch_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(dispatch_graph.nodes, dispatch_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
