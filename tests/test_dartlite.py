"""Dart extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.dartlite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_classes_methods_and_clauses():
    src = (
        "class Circle extends Shape with Mix implements IRender {\n"
        "  double area() => 3;\n"
        "  void grow() {\n"
        "    this.area();\n"
        "  }\n"
        "}\n"
    )
    ms = parse_document("d/shapes.dart", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"d.shapes.Circle"}
    inh = [(m["callee"], m["base_index"]) for m in _by_kind(ms, "inherit")]
    assert inh == [("Shape", 0), ("Mix", 1), ("IRender", 2)]
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["this.area"]["class_ctx_hint"] == "d.shapes.Circle.area"


def test_imports():
    src = (
        "import 'package:dproj/shapes.dart';\n"
        "import 'util.dart';\n"
        "import '../lib/helpers.dart' as h;\n"
        "import 'dart:io';\n"
    )
    ms = parse_document("dproj/sub/app.dart", src)
    imps = {(m["local_name"], m["target"]) for m in _by_kind(ms, "import")}
    assert ("shapes", "dproj.shapes") in imps
    assert ("util", "dproj.sub.util") in imps
    assert ("h", "dproj.lib.helpers") in imps
    assert ("io", "external::dart.io") in imps


def test_newless_ctor_types_local():
    src = (
        "void use() {\n"
        "  final c = Circle();\n"
        "  c.area();\n"
        "  Shape s = Shape();\n"
        "  s.ident();\n"
        "}\n"
    )
    ms = parse_document("d/u.dart", src)
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.area"]["recv_expr"] == "Circle"
    assert calls["s.ident"]["recv_expr"] == "Shape"
    assert "Circle" in calls and "Shape" in calls  # ctor call sites


def test_abstract_signatures_and_expression_bodies():
    src = (
        "abstract class IRender {\n"
        "  void render();\n"
        "  Circle scale(double f);\n"
        "}\n"
        "Circle make() => Circle();\n"
    )
    ms = parse_document("d/i.dart", src)
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {"d.i.IRender.render", "d.i.IRender.scale"}
    fns = {m["qn"] for m in _by_kind(ms, "function")}
    assert fns == {"d.i.make"}
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("d.i.IRender.scale", "Circle") in rets
    assert ("d.i.make", "Circle") in rets
    # the expression body's ctor call attributes to make
    ctor = [m for m in _by_kind(ms, "call") if m["callee"] == "Circle"]
    assert any(m["parent_qn"] == "d.i.make" for m in ctor)


def test_chained_call():
    src = (
        "void useChained() {\n"
        "  make().area();\n"
        "}\n"
    )
    ms = parse_document("d/c.dart", src)
    chained = [m for m in _by_kind(ms, "call") if m["callee"] == "make().area"]
    assert len(chained) == 1 and chained[0]["recv_expr"] == "make"
