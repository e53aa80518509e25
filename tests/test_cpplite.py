"""C++ extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.cpplite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_header_classes_and_declarations():
    src = (
        "#pragma once\n\n"
        "class Shape {\n"
        "public:\n"
        "    virtual double area();\n"
        "    Shape* ident();\n"
        "};\n\n"
        "class Circle : public Shape {\n"
        "public:\n"
        "    double area() override;\n"
        "};\n"
    )
    ms = parse_document("p/shapes.h", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {
        "p.shapes.Shape",
        "p.shapes.Circle",
    }
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "p.shapes.Shape.area",
        "p.shapes.Shape.ident",
        "p.shapes.Circle.area",
    }
    inh = [(m["qn"], m["callee"]) for m in _by_kind(ms, "inherit")]
    assert inh == [("p.shapes.Circle", "Shape")]
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("p.shapes.Shape.ident", "Shape") in rets


def test_forward_declaration_mints_nothing():
    ms = parse_document("p/fwd.h", "class Circle;\nstruct Thing;\n")
    assert not _by_kind(ms, "class")


def test_out_of_class_same_file_binds_directly():
    src = (
        "class Widget {\n"
        "public:\n"
        "    void run();\n"
        "};\n\n"
        "void Widget::run() {\n"
        "    helper();\n"
        "}\n\n"
        "void helper() {\n"
        "}\n"
    )
    ms = parse_document("p/w.cpp", src)
    assert not _by_kind(ms, "method_impl")  # same-file: direct binding
    calls = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "call")}
    assert ("p.w.Widget.run", "helper") in calls


def test_out_of_class_cross_file_defers():
    src = (
        '#include "p/shapes.h"\n\n'
        "double Circle::area() {\n"
        "    return this->radius();\n"
        "}\n"
    )
    ms = parse_document("p/impl.cpp", src)
    impls = _by_kind(ms, "method_impl")
    assert len(impls) == 1
    assert impls[0]["local_name"] == "Circle"
    assert impls[0]["qn"] == "p.impl.Circle.area"
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    # provisional class-context hint, remapped by plans/cpp_impl.py
    assert calls["this.radius"]["class_ctx_hint"] == "p.impl.Circle.radius"


def test_includes_internal_external():
    src = '#include "p/a/b.h"\n#include <vector>\n#include <sys/types.h>\n'
    ms = parse_document("p/m.cpp", src)
    imps = {(m["target"]) for m in _by_kind(ms, "import")}
    assert imps == {"p.a.b.h", "external::vector", "external::sys.types"}


def test_receiver_typing_forms():
    src = (
        "void use() {\n"
        "    Circle c;\n"
        "    c.area();\n"
        "    Circle* p = new Circle();\n"
        "    p->grow();\n"
        "    auto q = make();\n"
        "    q->area();\n"
        "}\n"
    )
    ms = parse_document("p/u.cpp", src)
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.area"]["recv_expr"] == "Circle"
    assert calls["p.grow"]["recv_expr"] == "Circle"
    assert calls["q.area"]["recv_expr"] == "make"  # fn-return hop


def test_scoped_calls_normalize():
    src = "void f() {\n    Base::helper();\n    ns::util::go();\n}\n"
    ms = parse_document("p/s.cpp", src)
    calls = {m["callee"] for m in _by_kind(ms, "call")}
    assert "Base.helper" in calls
    assert "ns.util.go" in calls


def test_cpp20_module_declarations():
    # interface unit: `export module X;` (cpp_modules.py:77-103)
    ms = parse_document("p/geo.cppm", "export module geo.core;\n")
    mi = _by_kind(ms, "module_interface")
    assert [(m["target"], m["name"]) for m in mi] == [("geo.core", "geo.core")]
    # implementation unit: `module X;` (cpp_modules.py:113-145)
    ms = parse_document("p/gi.cpp", "module geo.core;\nint f() {\n}\n")
    mp = _by_kind(ms, "module_impl")
    assert [m["target"] for m in mp] == ["geo.core"]


def test_cpp20_module_fragments_skipped():
    # global fragment `module;` and private fragment `module :private;`
    # must emit nothing (the reference's CPP_MODULE_PRIVATE_PREFIX guard)
    src = "module;\nmodule :private;\n"
    ms = parse_document("p/frag.cpp", src)
    assert not _by_kind(ms, "module_interface")
    assert not _by_kind(ms, "module_impl")
