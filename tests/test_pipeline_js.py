"""End-to-end pipeline over a JavaScript corpus (the js_ts language tier).

The fixture mirrors the reference's two-file CALLS integration shape
(``test_graph_updater_integration.py:10-24``) plus the class/override/typed-
receiver cases of the JS tests (``tests/test_js_*``); expected triples are
hand-derived from the documented semantics — the same fixture-oracle style
as the Python tier (P/R = 1.0, exact set).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures import _doc, code
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

JS_DOCS = [
    _doc("jsproj/util.js", code("export function utilFunc() { return 2; }\n")),
    _doc(
        "jsproj/main.js",
        code(
            "import { utilFunc } from './util';\n"
            "function localFunc() { return 1; }\n"
            "export function mainFunc() {\n"
            "  utilFunc();\n"
            "  localFunc();\n"
            "}\n"
        ),
    ),
    _doc(
        "jsproj/shapes.js",
        code(
            "export class Shape {\n"
            "  area() { return 0; }\n"
            "  ident() { return this; }\n"
            "}\n"
            "export class Circle extends Shape {\n"
            "  area() { return 3; }\n"
            "}\n"
        ),
    ),
    _doc(
        "jsproj/app.js",
        code(
            "import { Circle } from './shapes';\n"
            "function make() { return new Circle(); }\n"
            "function useLocal() {\n"
            "  const c = new Circle();\n"
            "  c.area();\n"
            "  c.ident();\n"
            "}\n"
            "function useChained() {\n"
            "  make().area();\n"
            "}\n"
            "class BigCircle extends Circle {\n"
            "  area() {\n"
            "    return super.area();\n"
            "  }\n"
            "  draw() {\n"
            "    return this.area();\n"
            "  }\n"
            "}\n"
        ),
    ),
]

EXPECTED = {
    # structure / defines
    ("jsproj.util", "DEFINES", "jsproj.util.utilFunc"),
    ("jsproj.main", "DEFINES", "jsproj.main.localFunc"),
    ("jsproj.main", "DEFINES", "jsproj.main.mainFunc"),
    ("jsproj.shapes", "DEFINES", "jsproj.shapes.Shape"),
    ("jsproj.shapes", "DEFINES", "jsproj.shapes.Circle"),
    ("jsproj.app", "DEFINES", "jsproj.app.make"),
    ("jsproj.app", "DEFINES", "jsproj.app.useLocal"),
    ("jsproj.app", "DEFINES", "jsproj.app.useChained"),
    ("jsproj.app", "DEFINES", "jsproj.app.BigCircle"),
    ("jsproj.shapes.Shape", "DEFINES_METHOD", "jsproj.shapes.Shape.area"),
    ("jsproj.shapes.Shape", "DEFINES_METHOD", "jsproj.shapes.Shape.ident"),
    ("jsproj.shapes.Circle", "DEFINES_METHOD", "jsproj.shapes.Circle.area"),
    ("jsproj.app.BigCircle", "DEFINES_METHOD", "jsproj.app.BigCircle.area"),
    ("jsproj.app.BigCircle", "DEFINES_METHOD", "jsproj.app.BigCircle.draw"),
    # imports (ESM relative specifiers → module QNs)
    ("jsproj.main", "IMPORTS", "jsproj.util"),
    ("jsproj.app", "IMPORTS", "jsproj.shapes"),
    # exports
    ("jsproj.util", "EXPORTS", "jsproj.util.utilFunc"),
    ("jsproj.main", "EXPORTS", "jsproj.main.mainFunc"),
    ("jsproj.shapes", "EXPORTS", "jsproj.shapes.Shape"),
    ("jsproj.shapes", "EXPORTS", "jsproj.shapes.Circle"),
    # calls: import rung + same-module rung
    ("jsproj.main.mainFunc", "CALLS", "jsproj.util.utilFunc"),
    ("jsproj.main.mainFunc", "CALLS", "jsproj.main.localFunc"),
    # inheritance + overrides across files
    ("jsproj.shapes.Circle", "INHERITS", "jsproj.shapes.Shape"),
    ("jsproj.app.BigCircle", "INHERITS", "jsproj.shapes.Circle"),
    ("jsproj.shapes.Circle.area", "OVERRIDES", "jsproj.shapes.Shape.area"),
    ("jsproj.app.BigCircle.area", "OVERRIDES", "jsproj.shapes.Circle.area"),
    # new Ctor() → INSTANTIATES
    ("jsproj.app.make", "INSTANTIATES", "jsproj.shapes.Circle"),
    ("jsproj.app.useLocal", "INSTANTIATES", "jsproj.shapes.Circle"),
    # typed receiver: const c = new Circle(); c.area() / inherited c.ident()
    ("jsproj.app.useLocal", "CALLS", "jsproj.shapes.Circle.area"),
    ("jsproj.app.useLocal", "CALLS", "jsproj.shapes.Shape.ident"),
    # chained return-type inference: make().area()
    ("jsproj.app.useChained", "CALLS", "jsproj.app.make"),
    ("jsproj.app.useChained", "CALLS", "jsproj.shapes.Circle.area"),
    # super.m() → nearest base; this.m() → own class
    ("jsproj.app.BigCircle.area", "CALLS", "jsproj.shapes.Circle.area"),
    ("jsproj.app.BigCircle.draw", "CALLS", "jsproj.app.BigCircle.area"),
}

FORBIDDEN = {
    # typed receiver prefers the receiver class over its ancestor
    ("jsproj.app.useLocal", "CALLS", "jsproj.shapes.Shape.area"),
    # super() must skip the own class
    ("jsproj.app.BigCircle.area", "CALLS", "jsproj.app.BigCircle.area"),
    # this.m() must prefer the own class over the base
    ("jsproj.app.BigCircle.draw", "CALLS", "jsproj.shapes.Circle.area"),
}


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
    missing = EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_js_forbidden_triples(js_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in js_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (FORBIDDEN & got), f"forbidden={sorted(FORBIDDEN & got)}"


def test_js_precision_on_calls(js_graph):
    """Precision check: no unexpected CALLS/INSTANTIATES edges at all."""
    got = {
        (r.subj, r.pred, r.obj)
        for r in js_graph.edges.filter(
            F.col("pred").isin("CALLS", "INSTANTIATES")
        ).collect()
    }
    want = {t for t in EXPECTED if t[1] in ("CALLS", "INSTANTIATES")}
    assert got == want, (
        f"extra={sorted(got - want)} missing={sorted(want - got)}"
    )


def test_js_audit_clean(js_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(js_graph.nodes, js_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
