"""End-to-end pipeline over a Java corpus (the java language tier).

Mirrors the JS-tier fixture shape (tests/test_pipeline_js.py) with Java's
static-type resolution paths: declared local types, parameter types,
method return types, constructors, extends/implements split. Expected set
hand-derived from the reference's java-tier semantics (parsers/java/,
tests/test_java_*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures import _doc, code
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

JAVA_DOCS = [
    _doc(
        "jproj/shapes/Shape.java",
        code(
            "package jproj.shapes;\n\n"
            "public class Shape {\n"
            "    public double area() {\n"
            "        return 0;\n"
            "    }\n"
            "    public Shape ident() {\n"
            "        return this;\n"
            "    }\n"
            "}\n"
        ),
    ),
    _doc(
        "jproj/shapes/Circle.java",
        code(
            "package jproj.shapes;\n\n"
            "public class Circle extends Shape {\n"
            "    public double area() {\n"
            "        return 3;\n"
            "    }\n"
            "}\n"
        ),
    ),
    _doc(
        "jproj/app/Renderable.java",
        code(
            "package jproj.app;\n\n"
            "public interface Renderable {\n"
            "    void render();\n"
            "}\n"
        ),
    ),
    _doc(
        "jproj/app/App.java",
        code(
            "package jproj.app;\n\n"
            "import jproj.shapes.Circle;\n"
            "import jproj.shapes.Shape;\n\n"
            "public class App implements Renderable {\n"
            "    public Circle make() {\n"
            "        return new Circle();\n"
            "    }\n"
            "    public void useLocal() {\n"
            "        Circle c = new Circle();\n"
            "        c.area();\n"
            "        c.ident();\n"
            "    }\n"
            "    public void useParam(Shape s) {\n"
            "        s.area();\n"
            "    }\n"
            "    public void useChained() {\n"
            "        make().area();\n"
            "    }\n"
            "    public void render() {\n"
            "    }\n"
            "}\n"
        ),
    ),
    _doc(
        "jproj/app/BigCircle.java",
        code(
            "package jproj.app;\n\n"
            "import jproj.shapes.Circle;\n\n"
            "public class BigCircle extends Circle {\n"
            "    public double area() {\n"
            "        return super.area();\n"
            "    }\n"
            "    public double draw() {\n"
            "        return this.area();\n"
            "    }\n"
            "}\n"
        ),
    ),
]

EXPECTED = {
    # defines / methods (module = file path QN; Circle.java → jproj.shapes.Circle)
    ("jproj.shapes.Shape", "DEFINES", "jproj.shapes.Shape.Shape"),
    ("jproj.shapes.Shape.Shape", "DEFINES_METHOD", "jproj.shapes.Shape.Shape.area"),
    ("jproj.shapes.Shape.Shape", "DEFINES_METHOD", "jproj.shapes.Shape.Shape.ident"),
    ("jproj.shapes.Circle", "DEFINES", "jproj.shapes.Circle.Circle"),
    ("jproj.shapes.Circle.Circle", "DEFINES_METHOD", "jproj.shapes.Circle.Circle.area"),
    ("jproj.app.App", "DEFINES", "jproj.app.App.App"),
    ("jproj.app.Renderable", "DEFINES", "jproj.app.Renderable.Renderable"),
    ("jproj.app.BigCircle", "DEFINES", "jproj.app.BigCircle.BigCircle"),
    # imports
    ("jproj.app.App", "IMPORTS", "jproj.shapes"),
    ("jproj.app.BigCircle", "IMPORTS", "jproj.shapes"),
    # inheritance across files (import-resolved) + interface split
    ("jproj.shapes.Circle.Circle", "INHERITS", "jproj.shapes.Shape.Shape"),
    ("jproj.app.BigCircle.BigCircle", "INHERITS", "jproj.shapes.Circle.Circle"),
    ("jproj.app.App.App", "IMPLEMENTS", "jproj.app.Renderable.Renderable"),
    # overrides through the closure
    (
        "jproj.shapes.Circle.Circle.area",
        "OVERRIDES",
        "jproj.shapes.Shape.Shape.area",
    ),
    (
        "jproj.app.BigCircle.BigCircle.area",
        "OVERRIDES",
        "jproj.shapes.Circle.Circle.area",
    ),
    (
        "jproj.app.App.App.render",
        "OVERRIDES",
        "jproj.app.Renderable.Renderable.render",
    ),
    # typed receivers: declared local, declared param, chained return type
    ("jproj.app.App.App.make", "INSTANTIATES", "jproj.shapes.Circle.Circle"),
    ("jproj.app.App.App.useLocal", "INSTANTIATES", "jproj.shapes.Circle.Circle"),
    ("jproj.app.App.App.useLocal", "CALLS", "jproj.shapes.Circle.Circle.area"),
    ("jproj.app.App.App.useLocal", "CALLS", "jproj.shapes.Shape.Shape.ident"),
    ("jproj.app.App.App.useParam", "CALLS", "jproj.shapes.Shape.Shape.area"),
    ("jproj.app.App.App.useChained", "CALLS", "jproj.app.App.App.make"),
    ("jproj.app.App.App.useChained", "CALLS", "jproj.shapes.Circle.Circle.area"),
    # super / this dispatch
    (
        "jproj.app.BigCircle.BigCircle.area",
        "CALLS",
        "jproj.shapes.Circle.Circle.area",
    ),
    (
        "jproj.app.BigCircle.BigCircle.draw",
        "CALLS",
        "jproj.app.BigCircle.BigCircle.area",
    ),
}

FORBIDDEN = {
    ("jproj.app.App.App.useLocal", "CALLS", "jproj.shapes.Shape.Shape.area"),
    (
        "jproj.app.BigCircle.BigCircle.area",
        "CALLS",
        "jproj.app.BigCircle.BigCircle.area",
    ),
    (
        "jproj.app.BigCircle.BigCircle.draw",
        "CALLS",
        "jproj.shapes.Circle.Circle.area",
    ),
}


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
    missing = EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_java_forbidden_triples(java_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in java_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (FORBIDDEN & got), f"forbidden={sorted(FORBIDDEN & got)}"


def test_java_audit_clean(java_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(java_graph.nodes, java_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
