"""Java extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.javalite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_class_methods_ctor():
    src = (
        "package com.acme;\n"
        "public class App {\n"
        "    public App() { }\n"
        "    public int run(int x) { return x; }\n"
        "    private static String helper() { return null; }\n"
        "}\n"
    )
    ms = parse_document("acme/App.java", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"acme.App.App"}
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "acme.App.App.App",
        "acme.App.App.run",
        "acme.App.App.helper",
    }
    # primitive/keyword return types yield no returns facts
    assert not _by_kind(ms, "returns")


def test_imports_bind_full_path():
    src = (
        "import com.acme.shapes.Circle;\n"
        "import java.util.List;\n"
        "import com.acme.util.*;\n"
        "import static java.lang.Math.max;\n"
        "class A { }\n"
    )
    ms = parse_document("acme/A.java", src)
    # the IMPORTS edge target is the containing package; the BINDING
    # (callee) keeps the full class path so the alias frame resolves the
    # class entity
    imps = {
        (m["local_name"], m["target"], m["callee"], m["name"])
        for m in _by_kind(ms, "import")
    }
    assert ("Circle", "com.acme.shapes", "com.acme.shapes.Circle", "Circle") in imps
    assert ("List", "java.util", "java.util.List", "List") in imps
    assert ("util", "com.acme.util", "com.acme.util", None) in imps  # wildcard
    assert ("max", "java.lang", "java.lang.Math", "max") in imps


def test_extends_implements_and_dispatch():
    src = (
        "public class Big extends Base implements Renderable, Closeable {\n"
        "    public double area() {\n"
        "        return super.area();\n"
        "    }\n"
        "    public void draw() {\n"
        "        this.area();\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("p/Big.java", src)
    inh = [(m["callee"], m["base_index"]) for m in _by_kind(ms, "inherit")]
    assert inh == [("Base", 0), ("Renderable", 1), ("Closeable", 2)]
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["super().area"]["super_hint"] == "p.Big.Big"
    assert calls["this.area"]["class_ctx_hint"] == "p.Big.Big.area"


def test_declared_types_and_returns():
    src = (
        "import com.acme.shapes.Circle;\n"
        "public class U {\n"
        "    public Circle make() {\n"
        "        return new Circle();\n"
        "    }\n"
        "    public void go(Shape s) {\n"
        "        Circle c = new Circle();\n"
        "        c.area();\n"
        "        s.area();\n"
        "        make().area();\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("p/U.java", src)
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("p.U.U.make", "Circle") in rets
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.area"]["recv_expr"] == "Circle"  # declared local
    assert calls["s.area"]["recv_expr"] == "Shape"  # declared param
    # chained return type: implicit-this qualifies the receiver expr with
    # the enclosing class's module-relative path
    assert calls["make().area"]["recv_expr"] == "U.make"
    # return new Circle() inside make is the return-flow source; the plain
    # ctor call inside go is not
    ctor_rows = {
        (m["parent_qn"], m["is_ret"])
        for m in _by_kind(ms, "call")
        if m["callee"] == "Circle"
    }
    assert ("p.U.U.make", True) in ctor_rows
    assert ("p.U.U.go", False) in ctor_rows


def test_strings_comments_ignored():
    src = (
        "public class S {\n"
        "    void f() {\n"
        "        // fake();\n"
        "        /* fake2(); */\n"
        "        String s = \"fake3()\";\n"
        "        real();\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("p/S.java", src)
    callees = {m["callee"] for m in _by_kind(ms, "call")}
    assert "real" in callees
    assert not {"fake", "fake2", "fake3"} & callees
