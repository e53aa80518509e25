"""Go extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.golite import parse_document
from code_graph_rag_spark.extract.pylite import module_qn_for


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_package_dir_collapse():
    assert module_qn_for("goproj/shapes/shapes.go")[0] == "goproj.shapes"
    assert module_qn_for("goproj/app/app.go")[0] == "goproj.app"
    assert module_qn_for("goproj/app/extra.go")[0] == "goproj.app.extra"


def test_receiver_methods_attach_to_type():
    src = (
        "package shapes\n\n"
        "type Circle struct{}\n\n"
        "func (c *Circle) Area() float64 {\n"
        "\treturn 3\n"
        "}\n\n"
        "func (c *Circle) Grow() {\n"
        "\tc.Area()\n"
        "}\n"
    )
    ms = parse_document("goproj/shapes/shapes.go", src)
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "goproj.shapes.Circle.Area",
        "goproj.shapes.Circle.Grow",
    }
    # receiver var is typed by the receiver declaration
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.Area"]["recv_expr"] == "Circle"


def test_imports_and_raw_strings():
    src = (
        "package app\n\n"
        "import (\n"
        '\t"fmt"\n'
        '\tsh "goproj/shapes"\n'
        ")\n\n"
        "func Use() {\n"
        "\tq := `raw ( string { with } noise`\n"
        "\tfmt.Println(q)\n"
        "}\n"
    )
    ms = parse_document("goproj/app/app.go", src)
    imps = {(m["local_name"], m["target"]) for m in _by_kind(ms, "import")}
    assert imps == {("fmt", "fmt"), ("sh", "goproj.shapes")}
    calls = {m["callee"] for m in _by_kind(ms, "call")}
    assert "fmt.Println" in calls


def test_interface_with_sigs_and_exports():
    src = (
        "package shapes\n\n"
        "type Render interface {\n"
        "\tRender() error\n"
        "\tScale(f float64) Render\n"
        "}\n\n"
        "func helperPrivate() {}\n"
    )
    ms = parse_document("goproj/shapes/shapes.go", src)
    assert {m["qn"] for m in _by_kind(ms, "interface")} == {
        "goproj.shapes.Render"
    }
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "goproj.shapes.Render.Render",
        "goproj.shapes.Render.Scale",
    }
    # case-based visibility: only capitalized module-level names export
    exports = {m["name"] for m in _by_kind(ms, "export")}
    assert exports == {"Render"}


def test_typed_receivers_and_chained():
    src = (
        "package app\n\n"
        'import "goproj/shapes"\n\n'
        "func Make() *shapes.Circle {\n"
        "\treturn shapes.NewCircle()\n"
        "}\n\n"
        "func Use() {\n"
        "\tc := shapes.NewCircle()\n"
        "\tvar d shapes.Circle\n"
        "\tc.Area()\n"
        "\td.Area()\n"
        "\tMake().Area()\n"
        "}\n"
    )
    ms = parse_document("goproj/app/app.go", src)
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("goproj.app.Make", "shapes.Circle") in rets
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["c.Area"]["recv_expr"] == "shapes.NewCircle"  # fn-return hop
    assert calls["d.Area"]["recv_expr"] == "shapes.Circle"  # var decl
    assert calls["Make().Area"]["recv_expr"] == "Make"  # chained


def test_composite_literal_instantiates():
    src = (
        "package shapes\n\n"
        "type Circle struct{}\n\n"
        "func NewCircle() *Circle {\n"
        "\treturn &Circle{}\n"
        "}\n\n"
        "func Clone() Circle {\n"
        "\tc := Circle{}\n"
        "\treturn c\n"
        "}\n"
    )
    ms = parse_document("goproj/shapes/shapes.go", src)
    ctor_calls = [
        m for m in _by_kind(ms, "call") if m["callee"] == "Circle"
    ]
    assert {m["parent_qn"] for m in ctor_calls} == {
        "goproj.shapes.NewCircle",
        "goproj.shapes.Clone",
    }


def test_gomod_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import (
        parse_document as parse_py,
    )

    src = (
        "module example.com/goproj\n\n"
        "go 1.22\n\n"
        "require (\n"
        "\tgithub.com/stretchr/testify v1.8.0\n"
        ")\n"
        "require golang.org/x/sync v0.5.0\n"
    )
    ms = parse_py("goproj/go.mod", src)
    deps = {m["name"] for m in ms if m["kind"] == "dependency"}
    assert deps == {"github.com/stretchr/testify", "golang.org/x/sync"}


def test_cargo_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import (
        parse_document as parse_py,
    )

    src = (
        "[package]\n"
        'name = "rproj"\n'
        'version = "0.1.0"\n\n'
        "[dependencies]\n"
        'serde = "1.0"\n'
        'tokio = { version = "1.35", features = ["full"] }\n\n'
        "[dev-dependencies]\n"
        'criterion = "0.5"\n'
    )
    ms = parse_py("rproj/Cargo.toml", src)
    deps = {
        (m["name"],)
        for m in ms
        if m["kind"] == "dependency"
    }
    assert deps == {("serde",), ("tokio",), ("criterion",)}
