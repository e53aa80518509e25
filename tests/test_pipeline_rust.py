"""End-to-end pipeline over a Rust corpus (the rs language tier).

Mirrors the JS/Java fixture shape with Rust semantics: use-imports with
crate anchoring, struct/trait/impl (methods attach to the impl target,
trait impls → IMPLEMENTS), typed lets / params / return annotations,
Type::assoc() calls. Expected set hand-derived (reference parsers/rs/,
tests/test_rust_*)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from code_graph_rag_spark.fixtures import _doc, code
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA

RUST_DOCS = [
    _doc(
        "rproj/shapes.rs",
        code(
            "pub trait Render {\n"
            "    fn render(&self);\n"
            "}\n\n"
            "pub struct Shape;\n\n"
            "impl Shape {\n"
            "    pub fn area(&self) -> f64 {\n"
            "        0.0\n"
            "    }\n"
            "}\n\n"
            "pub struct Circle;\n\n"
            "impl Circle {\n"
            "    pub fn new() -> Self {\n"
            "        Circle\n"
            "    }\n"
            "    pub fn area(&self) -> f64 {\n"
            "        3.0\n"
            "    }\n"
            "    pub fn grow(&self) {\n"
            "        self.area();\n"
            "    }\n"
            "}\n\n"
            "impl Render for Circle {\n"
            "    fn render(&self) {\n"
            "        self.area();\n"
            "    }\n"
            "}\n"
        ),
    ),
    _doc(
        "rproj/app.rs",
        code(
            "use crate::shapes::Circle;\n"
            "use crate::shapes::Shape;\n\n"
            "pub fn make() -> Circle {\n"
            "    Circle::new()\n"
            "}\n\n"
            "pub fn use_local() {\n"
            "    let c: Circle = make();\n"
            "    c.area();\n"
            "    c.grow();\n"
            "}\n\n"
            "pub fn use_param(s: &Shape) {\n"
            "    s.area();\n"
            "}\n\n"
            "pub fn use_chained() {\n"
            "    make().area();\n"
            "}\n"
        ),
    ),
]

EXPECTED = {
    # defines
    ("rproj.shapes", "DEFINES", "rproj.shapes.Render"),
    ("rproj.shapes", "DEFINES", "rproj.shapes.Shape"),
    ("rproj.shapes", "DEFINES", "rproj.shapes.Circle"),
    ("rproj.app", "DEFINES", "rproj.app.make"),
    ("rproj.app", "DEFINES", "rproj.app.use_local"),
    ("rproj.app", "DEFINES", "rproj.app.use_param"),
    ("rproj.app", "DEFINES", "rproj.app.use_chained"),
    # impl methods attach to the struct; trait method to the trait
    ("rproj.shapes.Render", "DEFINES_METHOD", "rproj.shapes.Render.render"),
    ("rproj.shapes.Shape", "DEFINES_METHOD", "rproj.shapes.Shape.area"),
    ("rproj.shapes.Circle", "DEFINES_METHOD", "rproj.shapes.Circle.new"),
    ("rproj.shapes.Circle", "DEFINES_METHOD", "rproj.shapes.Circle.area"),
    ("rproj.shapes.Circle", "DEFINES_METHOD", "rproj.shapes.Circle.grow"),
    ("rproj.shapes.Circle", "DEFINES_METHOD", "rproj.shapes.Circle.render"),
    # use-imports resolve to the defining module
    ("rproj.app", "IMPORTS", "rproj.shapes"),
    # trait impl → IMPLEMENTS + override through the closure
    ("rproj.shapes.Circle", "IMPLEMENTS", "rproj.shapes.Render"),
    (
        "rproj.shapes.Circle.render",
        "OVERRIDES",
        "rproj.shapes.Render.render",
    ),
    # Type::assoc() through the import rung
    ("rproj.app.make", "CALLS", "rproj.shapes.Circle.new"),
    # typed let / param / chained return type
    ("rproj.app.use_local", "CALLS", "rproj.app.make"),
    ("rproj.app.use_local", "CALLS", "rproj.shapes.Circle.area"),
    ("rproj.app.use_local", "CALLS", "rproj.shapes.Circle.grow"),
    ("rproj.app.use_param", "CALLS", "rproj.shapes.Shape.area"),
    ("rproj.app.use_chained", "CALLS", "rproj.app.make"),
    ("rproj.app.use_chained", "CALLS", "rproj.shapes.Circle.area"),
    # self-dispatch inside impls
    ("rproj.shapes.Circle.grow", "CALLS", "rproj.shapes.Circle.area"),
    ("rproj.shapes.Circle.render", "CALLS", "rproj.shapes.Circle.area"),
}

FORBIDDEN = {
    # typed receiver must prefer Circle's area, never Shape's
    ("rproj.app.use_local", "CALLS", "rproj.shapes.Shape.area"),
    ("rproj.app.use_chained", "CALLS", "rproj.shapes.Shape.area"),
    # param typed Shape must not bind Circle's area
    ("rproj.app.use_param", "CALLS", "rproj.shapes.Circle.area"),
}


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
    missing = EXPECTED - got
    assert not missing, f"missing={sorted(missing)}"


def test_rust_forbidden_triples(rust_graph):
    got = {
        (r.subj, r.pred, r.obj)
        for r in rust_graph.edges.select("subj", "pred", "obj").collect()
    }
    assert not (FORBIDDEN & got), f"forbidden={sorted(FORBIDDEN & got)}"


def test_rust_audit_clean(rust_graph):
    from code_graph_rag_spark.audit import audit

    rep = audit(rust_graph.nodes, rust_graph.edges)
    assert rep.dangling_edges == 0 and rep.duplicate_keys == 0
