"""C# extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.cslite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_allman_classes_and_methods():
    src = (
        "namespace P.S;\n\n"
        "public class Shape\n"
        "{\n"
        "    public double Area()\n"
        "    {\n"
        "        return 0;\n"
        "    }\n"
        "    public Shape Ident() => this;\n"
        "}\n"
    )
    ms = parse_document("p/s/Shape.cs", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"p.s.Shape.Shape"}
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {"p.s.Shape.Shape.Area", "p.s.Shape.Shape.Ident"}
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("p.s.Shape.Shape.Ident", "Shape") in rets


def test_base_list_fans_out():
    src = (
        "public class Circle : Shape, IRender\n"
        "{\n"
        "    public override double Area() => 3;\n"
        "}\n"
    )
    ms = parse_document("p/Circle.cs", src)
    inh = [(m["callee"], m["base_index"]) for m in _by_kind(ms, "inherit")]
    assert inh == [("Shape", 0), ("IRender", 1)]


def test_usings():
    src = (
        "using CsProj.Shapes;\n"
        "using static CsProj.Shapes.Circle;\n"
        "using Alias = CsProj.Shapes.Shape;\n"
        "class A { }\n"
    )
    ms = parse_document("p/A.cs", src)
    imps = {
        (m["local_name"], m["target"], m["callee"])
        for m in _by_kind(ms, "import")
    }
    assert ("Shapes", "CsProj.Shapes", "CsProj.Shapes") in imps
    assert ("Circle", "CsProj.Shapes", "CsProj.Shapes.Circle") in imps
    assert ("Alias", "CsProj.Shapes", "CsProj.Shapes.Shape") in imps


def test_typed_receivers_and_chained():
    src = (
        "public class App\n"
        "{\n"
        "    public Circle Make()\n"
        "    {\n"
        "        return new Circle();\n"
        "    }\n"
        "    public void Use(Shape s)\n"
        "    {\n"
        "        Circle c = new Circle();\n"
        "        c.Area();\n"
        "        var d = new Circle();\n"
        "        d.Grow();\n"
        "        s.Area();\n"
        "        Make().Area();\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("p/App.cs", src)
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.Area"]["recv_expr"] == "Circle"
    assert calls["d.Grow"]["recv_expr"] == "Circle"  # var x = new T()
    assert calls["s.Area"]["recv_expr"] == "Shape"  # param type
    assert calls["Make().Area"]["recv_expr"] == "App.Make"  # implicit this
    ctor = [m for m in _by_kind(ms, "call") if m["callee"] == "Circle"]
    assert len(ctor) == 3  # new Circle() sites


def test_this_base_dispatch_and_properties_skipped():
    src = (
        "public class Big : Circle\n"
        "{\n"
        "    public double R { get; set; }\n"
        "    public override double Area()\n"
        "    {\n"
        "        return base.Area();\n"
        "    }\n"
        "    public double Draw()\n"
        "    {\n"
        "        return this.Area();\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("p/Big.cs", src)
    meths = {m["name"] for m in _by_kind(ms, "method")}
    assert meths == {"Area", "Draw"}  # property R is not a method
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["super().Area"]["super_hint"] == "p.Big.Big"
    assert calls["this.Area"]["class_ctx_hint"] == "p.Big.Big.Area"


def test_interface_signatures():
    src = (
        "public interface IRender\n"
        "{\n"
        "    void Render();\n"
        "    Circle Scale(double f);\n"
        "}\n"
    )
    ms = parse_document("p/IRender.cs", src)
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "p.IRender.IRender.Render",
        "p.IRender.IRender.Scale",
    }
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("p.IRender.IRender.Scale", "Circle") in rets
