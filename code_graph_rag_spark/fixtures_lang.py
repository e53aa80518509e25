"""Packaged language-tier fixtures: corpora + hand-derived expected
triple sets for the JS/Java/Rust pipeline tests AND the driver contract
(``__spark_entry__.kg_{js,java,rust}_build``).

Lives in the package (not tests/) so the driver contract works under
spark-submit with only ``dist/cgr_spark.zip`` on the path — importing
``tests.*`` from the entry raised ImportError outside a full repo
checkout.

Expected sets are hand-derived from the reference semantics
(parsers/js_ts/, parsers/java/, parsers/rs/ test suites); the pipeline
tests assert them, and the driver replays them as DuckDB VALUES oracles.
"""

from __future__ import annotations

from code_graph_rag_spark.fixtures import _doc, code

# predicate whitelist shared by the per-language exact-set pipeline tests
# and the kg_{js,java,rust}_build driver oracles: on these predicates the
# engine's edge set must EQUAL the expected set (not merely contain it)
LANG_ORACLE_PREDS = (
    "DEFINES",
    "DEFINES_METHOD",
    "IMPORTS",
    "EXPORTS",
    "CALLS",
    "INSTANTIATES",
    "INHERITS",
    "IMPLEMENTS",
    "OVERRIDES",
    "DEPENDS_ON_EXTERNAL",
    # module-system labels (ref constants/graph.py:156-157)
    "EXPORTS_MODULE",
    "IMPLEMENTS_MODULE",
)

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
    # CommonJS module (reference parsers/js_ts/module_system.py CJS export
    # queries + export_detection.py statement-block stop rule): member
    # exports name their local, an anonymous member function is named by
    # its export, and assignments inside a function body are NOT exports
    _doc(
        "jsproj/legacy.js",
        code(
            "const { utilFunc } = require('./util');\n"
            "function listAll() { return utilFunc(); }\n"
            "function makeOne(n) { return n; }\n"
            "exports.list = listAll;\n"
            "module.exports.make = makeOne;\n"
            "exports.compute = function (x) { return x + 1; };\n"
            "function hidden() {\n"
            "  exports.sneaky = hidden;\n"
            "}\n"
        ),
    ),
]

JS_EXPECTED = {
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
    # CommonJS: destructured require binds the member for call resolution
    ("jsproj.legacy", "DEFINES", "jsproj.legacy.listAll"),
    ("jsproj.legacy", "DEFINES", "jsproj.legacy.makeOne"),
    ("jsproj.legacy", "DEFINES", "jsproj.legacy.compute"),
    ("jsproj.legacy", "DEFINES", "jsproj.legacy.hidden"),
    ("jsproj.legacy", "IMPORTS", "jsproj.util"),
    ("jsproj.legacy.listAll", "CALLS", "jsproj.util.utilFunc"),
    # CJS exports: `exports.x = local` / `module.exports.y = local` export
    # the LOCAL declaration; an anonymous member fn is named by its export
    ("jsproj.legacy", "EXPORTS", "jsproj.legacy.listAll"),
    ("jsproj.legacy", "EXPORTS", "jsproj.legacy.makeOne"),
    ("jsproj.legacy", "EXPORTS", "jsproj.legacy.compute"),
}

JS_FORBIDDEN = {
    # typed receiver prefers the receiver class over its ancestor
    ("jsproj.app.useLocal", "CALLS", "jsproj.shapes.Shape.area"),
    # super() must skip the own class
    ("jsproj.app.BigCircle.area", "CALLS", "jsproj.app.BigCircle.area"),
    # this.m() must prefer the own class over the base
    ("jsproj.app.BigCircle.draw", "CALLS", "jsproj.shapes.Circle.area"),
    # the statement-block stop rule: a CJS assignment inside a function
    # body runs at call time, never a module export
    ("jsproj.legacy", "EXPORTS", "jsproj.legacy.hidden"),
}

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

JAVA_EXPECTED = {
    # defines / methods (module = file path QN; Circle.java → jproj.shapes.Circle)
    ("jproj.shapes.Shape", "DEFINES", "jproj.shapes.Shape.Shape"),
    ("jproj.shapes.Shape.Shape", "DEFINES_METHOD", "jproj.shapes.Shape.Shape.area"),
    ("jproj.shapes.Shape.Shape", "DEFINES_METHOD", "jproj.shapes.Shape.Shape.ident"),
    ("jproj.shapes.Circle", "DEFINES", "jproj.shapes.Circle.Circle"),
    ("jproj.shapes.Circle.Circle", "DEFINES_METHOD", "jproj.shapes.Circle.Circle.area"),
    ("jproj.app.App", "DEFINES", "jproj.app.App.App"),
    ("jproj.app.Renderable", "DEFINES", "jproj.app.Renderable.Renderable"),
    ("jproj.app.App.App", "DEFINES_METHOD", "jproj.app.App.App.make"),
    ("jproj.app.App.App", "DEFINES_METHOD", "jproj.app.App.App.render"),
    ("jproj.app.App.App", "DEFINES_METHOD", "jproj.app.App.App.useChained"),
    ("jproj.app.App.App", "DEFINES_METHOD", "jproj.app.App.App.useLocal"),
    ("jproj.app.App.App", "DEFINES_METHOD", "jproj.app.App.App.useParam"),
    (
        "jproj.app.BigCircle.BigCircle",
        "DEFINES_METHOD",
        "jproj.app.BigCircle.BigCircle.area",
    ),
    (
        "jproj.app.BigCircle.BigCircle",
        "DEFINES_METHOD",
        "jproj.app.BigCircle.BigCircle.draw",
    ),
    (
        "jproj.app.Renderable.Renderable",
        "DEFINES_METHOD",
        "jproj.app.Renderable.Renderable.render",
    ),
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

JAVA_FORBIDDEN = {
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

RUST_EXPECTED = {
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

RUST_FORBIDDEN = {
    # typed receiver must prefer Circle's area, never Shape's
    ("rproj.app.use_local", "CALLS", "rproj.shapes.Shape.area"),
    ("rproj.app.use_chained", "CALLS", "rproj.shapes.Shape.area"),
    # param typed Shape must not bind Circle's area
    ("rproj.app.use_param", "CALLS", "rproj.shapes.Circle.area"),
}


GO_DOCS = [
    _doc(
        "goproj/go.mod",
        code(
            "module example.com/goproj\n\n"
            "go 1.22\n\n"
            "require (\n"
            "\tgithub.com/stretchr/testify v1.8.0\n"
            "\tgolang.org/x/sync v0.5.0\n"
            ")\n"
        ),
    ),
    _doc(
        "goproj/shapes/shapes.go",
        code(
            "package shapes\n\n"
            "type Render interface {\n"
            "\tRender() error\n"
            "}\n\n"
            "type Shape struct{}\n\n"
            "func (s *Shape) Area() float64 {\n"
            "\treturn 0\n"
            "}\n\n"
            "func (s *Shape) Ident() *Shape {\n"
            "\treturn s\n"
            "}\n\n"
            "type Circle struct{}\n\n"
            "func (c *Circle) Area() float64 {\n"
            "\treturn 3\n"
            "}\n\n"
            "func (c *Circle) Grow() {\n"
            "\tc.Area()\n"
            "}\n\n"
            "func NewCircle() *Circle {\n"
            "\treturn &Circle{}\n"
            "}\n"
        ),
    ),
    _doc(
        "goproj/app/app.go",
        code(
            "package app\n\n"
            "import (\n"
            '\t"fmt"\n'
            '\t"goproj/shapes"\n'
            ")\n\n"
            "func Make() *shapes.Circle {\n"
            "\treturn shapes.NewCircle()\n"
            "}\n\n"
            "func UseLocal() {\n"
            "\tc := shapes.NewCircle()\n"
            "\tc.Area()\n"
            "\tc.Grow()\n"
            "}\n\n"
            "func UseVar() {\n"
            "\tvar d shapes.Circle\n"
            "\td.Area()\n"
            "}\n\n"
            "func UseParam(s *shapes.Shape) {\n"
            "\ts.Area()\n"
            "}\n\n"
            "func UseChained() {\n"
            "\tMake().Area()\n"
            '\tfmt.Println("done")\n'
            "}\n"
        ),
    ),
]

GO_EXPECTED = {
    # defines (shapes/shapes.go collapses to the dir module goproj.shapes)
    ("goproj.shapes", "DEFINES", "goproj.shapes.Render"),
    ("goproj.shapes", "DEFINES", "goproj.shapes.Shape"),
    ("goproj.shapes", "DEFINES", "goproj.shapes.Circle"),
    ("goproj.shapes", "DEFINES", "goproj.shapes.NewCircle"),
    ("goproj.app", "DEFINES", "goproj.app.Make"),
    ("goproj.app", "DEFINES", "goproj.app.UseLocal"),
    ("goproj.app", "DEFINES", "goproj.app.UseVar"),
    ("goproj.app", "DEFINES", "goproj.app.UseParam"),
    ("goproj.app", "DEFINES", "goproj.app.UseChained"),
    # receiver methods attach to their type (the deferred Go pass)
    ("goproj.shapes.Render", "DEFINES_METHOD", "goproj.shapes.Render.Render"),
    ("goproj.shapes.Shape", "DEFINES_METHOD", "goproj.shapes.Shape.Area"),
    ("goproj.shapes.Shape", "DEFINES_METHOD", "goproj.shapes.Shape.Ident"),
    ("goproj.shapes.Circle", "DEFINES_METHOD", "goproj.shapes.Circle.Area"),
    ("goproj.shapes.Circle", "DEFINES_METHOD", "goproj.shapes.Circle.Grow"),
    # imports: the dir module verifies internally; fmt is external
    ("goproj.app", "IMPORTS", "goproj.shapes"),
    ("goproj.app", "IMPORTS", "fmt"),
    # Go case-based visibility → EXPORTS
    ("goproj.shapes", "EXPORTS", "goproj.shapes.Render"),
    ("goproj.shapes", "EXPORTS", "goproj.shapes.Shape"),
    ("goproj.shapes", "EXPORTS", "goproj.shapes.Circle"),
    ("goproj.shapes", "EXPORTS", "goproj.shapes.NewCircle"),
    ("goproj.app", "EXPORTS", "goproj.app.Make"),
    ("goproj.app", "EXPORTS", "goproj.app.UseLocal"),
    ("goproj.app", "EXPORTS", "goproj.app.UseVar"),
    ("goproj.app", "EXPORTS", "goproj.app.UseParam"),
    ("goproj.app", "EXPORTS", "goproj.app.UseChained"),
    # go.mod manifest → Project DEPENDS_ON_EXTERNAL
    ("goproj", "DEPENDS_ON_EXTERNAL", "github.com/stretchr/testify"),
    ("goproj", "DEPENDS_ON_EXTERNAL", "golang.org/x/sync"),
    # calls: alias rung, composite-literal INSTANTIATES, receiver typing
    ("goproj.app.Make", "CALLS", "goproj.shapes.NewCircle"),
    ("goproj.shapes.NewCircle", "INSTANTIATES", "goproj.shapes.Circle"),
    ("goproj.app.UseLocal", "CALLS", "goproj.shapes.NewCircle"),
    ("goproj.app.UseLocal", "CALLS", "goproj.shapes.Circle.Area"),
    ("goproj.app.UseLocal", "CALLS", "goproj.shapes.Circle.Grow"),
    ("goproj.app.UseVar", "CALLS", "goproj.shapes.Circle.Area"),
    ("goproj.app.UseParam", "CALLS", "goproj.shapes.Shape.Area"),
    ("goproj.app.UseChained", "CALLS", "goproj.app.Make"),
    ("goproj.app.UseChained", "CALLS", "goproj.shapes.Circle.Area"),
    # receiver self-dispatch inside the type's own method
    ("goproj.shapes.Circle.Grow", "CALLS", "goproj.shapes.Circle.Area"),
}

GO_FORBIDDEN = {
    # receiver typed *Shape must never bind Circle's method (and vice versa)
    ("goproj.app.UseParam", "CALLS", "goproj.shapes.Circle.Area"),
    ("goproj.app.UseChained", "CALLS", "goproj.shapes.Shape.Area"),
    ("goproj.app.UseLocal", "CALLS", "goproj.shapes.Shape.Area"),
}


# findings-analyzer fixture (plans/findings.py; reference
# analyzers/ast_grep_analyzer.py): one program exercising a rule from
# every category. Expected rows are (subj, pred, obj) with the
# reference's finding-QN scheme module_qn.line.col.rule_id.
FINDINGS_DOCS = [
    _doc(
        "fproj/app.py",
        code(
            "from os.path import *\n"
            "import json\n"
            "\n"
            "API_TOKEN = 'abcd1234efgh'\n"
            "\n"
            "def make_widget():\n"
            "    try:\n"
            "        eval('1+1')\n"
            "    except:\n"
            "        pass\n"
            "\n"
            "def risky(items=[]):\n"
            "    global count\n"
            "    return items\n"
        ),
    ),
]

FINDINGS_EXPECTED = {
    ("fproj.app", "HAS_SMELL", "fproj.app.1.0.wildcard_import"),
    ("fproj.app", "HAS_VULNERABILITY", "fproj.app.4.4.hardcoded_secret"),
    ("fproj.app", "IMPLEMENTS_PATTERN", "fproj.app.6.0.factory_function"),
    ("fproj.app", "HAS_VULNERABILITY", "fproj.app.8.8.eval_call"),
    ("fproj.app", "HAS_SMELL", "fproj.app.9.0.bare_except"),
    ("fproj.app", "HAS_SMELL", "fproj.app.12.0.mutable_default_arg"),
    ("fproj.app", "HAS_SMELL", "fproj.app.13.0.global_statement"),
}


LUA_DOCS = [
    _doc(
        "lproj/shapes.lua",
        code(
            "local Circle = {}\n"
            "Circle.__index = Circle\n\n"
            "function Circle.new(r)\n"
            "    return setmetatable({}, Circle)\n"
            "end\n\n"
            "function Circle:area()\n"
            "    return 3\n"
            "end\n\n"
            "function Circle:grow()\n"
            "    self:area()\n"
            "end\n\n"
            "local function helper()\n"
            "    return 1\n"
            "end\n\n"
            "function top()\n"
            "    helper()\n"
            "end\n\n"
            "return Circle\n"
        ),
    ),
    _doc(
        "lproj/app.lua",
        code(
            'local shapes = require("lproj.shapes")\n\n'
            "local function use_local()\n"
            "    local c = shapes.Circle.new(2)\n"
            "    c:area()\n"
            "    c:grow()\n"
            "end\n\n"
            "local function make()\n"
            "    return shapes.Circle.new(1)\n"
            "end\n"
        ),
    ),
]

LUA_EXPECTED = {
    # defines: table-as-class + methods, module functions
    ("lproj.shapes", "DEFINES", "lproj.shapes.Circle"),
    ("lproj.shapes", "DEFINES", "lproj.shapes.helper"),
    ("lproj.shapes", "DEFINES", "lproj.shapes.top"),
    ("lproj.shapes.Circle", "DEFINES_METHOD", "lproj.shapes.Circle.new"),
    ("lproj.shapes.Circle", "DEFINES_METHOD", "lproj.shapes.Circle.area"),
    ("lproj.shapes.Circle", "DEFINES_METHOD", "lproj.shapes.Circle.grow"),
    ("lproj.app", "DEFINES", "lproj.app.use_local"),
    ("lproj.app", "DEFINES", "lproj.app.make"),
    # require → IMPORTS
    ("lproj.app", "IMPORTS", "lproj.shapes"),
    # return M → EXPORTS
    ("lproj.shapes", "EXPORTS", "lproj.shapes.Circle"),
    # calls: require-bound alias rung, self dispatch, fn-return hop
    ("lproj.shapes.Circle.grow", "CALLS", "lproj.shapes.Circle.area"),
    ("lproj.shapes.top", "CALLS", "lproj.shapes.helper"),
    ("lproj.app.use_local", "CALLS", "lproj.shapes.Circle.new"),
    ("lproj.app.use_local", "CALLS", "lproj.shapes.Circle.area"),
    ("lproj.app.use_local", "CALLS", "lproj.shapes.Circle.grow"),
    ("lproj.app.make", "CALLS", "lproj.shapes.Circle.new"),
    # module-system labels: the returned table is the declared interface
    # and the defining file its implementation unit (see lualite docstring)
    ("lproj.shapes", "EXPORTS_MODULE", "lproj.shapes::Circle"),
    ("lproj.shapes", "IMPLEMENTS_MODULE", "lproj.shapes::Circle_impl"),
    ("lproj.shapes::Circle_impl", "IMPLEMENTS", "lproj.shapes::Circle"),
}

LUA_FORBIDDEN = {
    # the def header must never read as a self-call
    ("lproj.shapes.Circle.new", "CALLS", "lproj.shapes.Circle.new"),
}


CS_DOCS = [
    _doc(
        "CsProj/Shapes/IRender.cs",
        code(
            "namespace CsProj.Shapes;\n\n"
            "public interface IRender\n"
            "{\n"
            "    void Render();\n"
            "}\n"
        ),
    ),
    _doc(
        "CsProj/Shapes/Shape.cs",
        code(
            "namespace CsProj.Shapes;\n\n"
            "public class Shape\n"
            "{\n"
            "    public double Area()\n"
            "    {\n"
            "        return 0;\n"
            "    }\n"
            "    public Shape Ident() => this;\n"
            "}\n"
        ),
    ),
    _doc(
        "CsProj/Shapes/Circle.cs",
        code(
            "namespace CsProj.Shapes;\n\n"
            "public class Circle : Shape\n"
            "{\n"
            "    public override double Area()\n"
            "    {\n"
            "        return 3;\n"
            "    }\n"
            "}\n"
        ),
    ),
    _doc(
        "CsProj/App/App.cs",
        code(
            "namespace CsProj.App;\n\n"
            "using CsProj.Shapes;\n\n"
            "public class App : IRender\n"
            "{\n"
            "    public Circle Make()\n"
            "    {\n"
            "        return new Circle();\n"
            "    }\n"
            "    public void UseLocal()\n"
            "    {\n"
            "        Circle c = new Circle();\n"
            "        c.Area();\n"
            "        c.Ident();\n"
            "    }\n"
            "    public void UseParam(Shape s)\n"
            "    {\n"
            "        s.Area();\n"
            "    }\n"
            "    public void UseChained()\n"
            "    {\n"
            "        Make().Area();\n"
            "    }\n"
            "    public void Render()\n"
            "    {\n"
            "    }\n"
            "}\n"
        ),
    ),
]

CS_EXPECTED = {
    # defines
    ("CsProj.Shapes.IRender", "DEFINES", "CsProj.Shapes.IRender.IRender"),
    ("CsProj.Shapes.Shape", "DEFINES", "CsProj.Shapes.Shape.Shape"),
    ("CsProj.Shapes.Circle", "DEFINES", "CsProj.Shapes.Circle.Circle"),
    ("CsProj.App.App", "DEFINES", "CsProj.App.App.App"),
    (
        "CsProj.Shapes.IRender.IRender",
        "DEFINES_METHOD",
        "CsProj.Shapes.IRender.IRender.Render",
    ),
    (
        "CsProj.Shapes.Shape.Shape",
        "DEFINES_METHOD",
        "CsProj.Shapes.Shape.Shape.Area",
    ),
    (
        "CsProj.Shapes.Shape.Shape",
        "DEFINES_METHOD",
        "CsProj.Shapes.Shape.Shape.Ident",
    ),
    (
        "CsProj.Shapes.Circle.Circle",
        "DEFINES_METHOD",
        "CsProj.Shapes.Circle.Circle.Area",
    ),
    ("CsProj.App.App.App", "DEFINES_METHOD", "CsProj.App.App.App.Make"),
    ("CsProj.App.App.App", "DEFINES_METHOD", "CsProj.App.App.App.UseLocal"),
    ("CsProj.App.App.App", "DEFINES_METHOD", "CsProj.App.App.App.UseParam"),
    (
        "CsProj.App.App.App",
        "DEFINES_METHOD",
        "CsProj.App.App.App.UseChained",
    ),
    ("CsProj.App.App.App", "DEFINES_METHOD", "CsProj.App.App.App.Render"),
    # using-namespace → IMPORTS the internal Package
    ("CsProj.App.App", "IMPORTS", "CsProj.Shapes"),
    # inheritance: unique-simple-name rung resolves cross-file bases;
    # IMPLEMENTS splits on the resolved Interface label
    (
        "CsProj.Shapes.Circle.Circle",
        "INHERITS",
        "CsProj.Shapes.Shape.Shape",
    ),
    ("CsProj.App.App.App", "IMPLEMENTS", "CsProj.Shapes.IRender.IRender"),
    (
        "CsProj.Shapes.Circle.Circle.Area",
        "OVERRIDES",
        "CsProj.Shapes.Shape.Shape.Area",
    ),
    (
        "CsProj.App.App.App.Render",
        "OVERRIDES",
        "CsProj.Shapes.IRender.IRender.Render",
    ),
    # calls/instantiations: unique-name ctor + typed receivers + chained
    ("CsProj.App.App.App.Make", "INSTANTIATES", "CsProj.Shapes.Circle.Circle"),
    (
        "CsProj.App.App.App.UseLocal",
        "INSTANTIATES",
        "CsProj.Shapes.Circle.Circle",
    ),
    (
        "CsProj.App.App.App.UseLocal",
        "CALLS",
        "CsProj.Shapes.Circle.Circle.Area",
    ),
    (
        "CsProj.App.App.App.UseLocal",
        "CALLS",
        "CsProj.Shapes.Shape.Shape.Ident",
    ),
    (
        "CsProj.App.App.App.UseParam",
        "CALLS",
        "CsProj.Shapes.Shape.Shape.Area",
    ),
    ("CsProj.App.App.App.UseChained", "CALLS", "CsProj.App.App.App.Make"),
    (
        "CsProj.App.App.App.UseChained",
        "CALLS",
        "CsProj.Shapes.Circle.Circle.Area",
    ),
}

CS_FORBIDDEN = {
    # typed receiver must prefer Circle's Area over Shape's
    ("CsProj.App.App.App.UseLocal", "CALLS", "CsProj.Shapes.Shape.Shape.Area"),
    ("CsProj.App.App.App.UseChained", "CALLS", "CsProj.Shapes.Shape.Shape.Area"),
    # param typed Shape must not bind Circle's Area
    ("CsProj.App.App.App.UseParam", "CALLS", "CsProj.Shapes.Circle.Circle.Area"),
}


CPP_DOCS = [
    _doc(
        "cpproj/shapes.h",
        code(
            "#pragma once\n\n"
            "class Shape {\n"
            "public:\n"
            "    virtual double area();\n"
            "    Shape* ident();\n"
            "};\n\n"
            "class Circle : public Shape {\n"
            "public:\n"
            "    double area() override;\n"
            "    void grow();\n"
            "};\n"
        ),
    ),
    _doc(
        "cpproj/shapes.cpp",
        code(
            '#include "cpproj/shapes.h"\n'
            "#include <vector>\n\n"
            "double Circle::area() {\n"
            "    return 3;\n"
            "}\n\n"
            "void Circle::grow() {\n"
            "    this->area();\n"
            "}\n\n"
            "Circle* make() {\n"
            "    return new Circle();\n"
            "}\n\n"
            "void use_local() {\n"
            "    Circle c;\n"
            "    c.area();\n"
            "    Circle* p = new Circle();\n"
            "    p->grow();\n"
            "}\n\n"
            "void use_auto() {\n"
            "    auto q = make();\n"
            "    q->area();\n"
            "}\n\n"
            "void use_param(Shape* s) {\n"
            "    s->area();\n"
            "}\n"
        ),
    ),
    # C++20 module units (ref cpp_modules.py): one interface, one
    # implementation of it, and one implementation of an ABSENT interface
    # (its IMPLEMENTS link must be suppressed — the deferred-impl rule).
    _doc(
        "cpproj/geo.cppm",
        code(
            "export module geo.core;\n\n"
            "export int twice(int x) {\n"
            "    return x + x;\n"
            "}\n"
        ),
    ),
    _doc(
        "cpproj/geo_impl.cpp",
        code(
            "module;\n"
            "module geo.core;\n\n"
            "int helper_g() {\n"
            "    return 1;\n"
            "}\n"
        ),
    ),
    _doc(
        "cpproj/orphan_impl.cpp",
        code("module absent.mod;\n"),
    ),
]

CPP_EXPECTED = {
    # defines: the .cpp keeps the plain module qn (first in doc order);
    # the colliding header becomes cpproj.shapes.h (disambiguate_modules)
    ("cpproj.shapes", "DEFINES", "cpproj.shapes.make"),
    ("cpproj.shapes", "DEFINES", "cpproj.shapes.use_auto"),
    ("cpproj.shapes", "DEFINES", "cpproj.shapes.use_local"),
    ("cpproj.shapes", "DEFINES", "cpproj.shapes.use_param"),
    ("cpproj.shapes.h", "DEFINES", "cpproj.shapes.h.Circle"),
    ("cpproj.shapes.h", "DEFINES", "cpproj.shapes.h.Shape"),
    # header declarations ARE the method entities
    (
        "cpproj.shapes.h.Circle",
        "DEFINES_METHOD",
        "cpproj.shapes.h.Circle.area",
    ),
    (
        "cpproj.shapes.h.Circle",
        "DEFINES_METHOD",
        "cpproj.shapes.h.Circle.grow",
    ),
    (
        "cpproj.shapes.h.Shape",
        "DEFINES_METHOD",
        "cpproj.shapes.h.Shape.area",
    ),
    (
        "cpproj.shapes.h.Shape",
        "DEFINES_METHOD",
        "cpproj.shapes.h.Shape.ident",
    ),
    # includes: quoted → internal module (extension-form ref), <> → external
    ("cpproj.shapes", "IMPORTS", "cpproj.shapes.h"),
    ("cpproj.shapes", "IMPORTS", "external::vector"),
    ("cpproj.shapes.h.Circle", "INHERITS", "cpproj.shapes.h.Shape"),
    (
        "cpproj.shapes.h.Circle.area",
        "OVERRIDES",
        "cpproj.shapes.h.Shape.area",
    ),
    # the deferred out-of-class pass: Circle::grow's this->area() binds
    # across the file boundary
    (
        "cpproj.shapes.h.Circle.grow",
        "CALLS",
        "cpproj.shapes.h.Circle.area",
    ),
    ("cpproj.shapes.make", "INSTANTIATES", "cpproj.shapes.h.Circle"),
    ("cpproj.shapes.use_local", "INSTANTIATES", "cpproj.shapes.h.Circle"),
    ("cpproj.shapes.use_local", "CALLS", "cpproj.shapes.h.Circle.area"),
    ("cpproj.shapes.use_local", "CALLS", "cpproj.shapes.h.Circle.grow"),
    ("cpproj.shapes.use_auto", "CALLS", "cpproj.shapes.make"),
    ("cpproj.shapes.use_auto", "CALLS", "cpproj.shapes.h.Circle.area"),
    ("cpproj.shapes.use_param", "CALLS", "cpproj.shapes.h.Shape.area"),
    # C++20 module units: declared-name interface key, `_impl` suffix
    # (cpp_modules.py:91,128); the orphan unit still gets its
    # IMPLEMENTS_MODULE row (emitted before the deferred gate)
    ("cpproj.geo", "EXPORTS_MODULE", "geo.core"),
    ("cpproj.geo_impl", "IMPLEMENTS_MODULE", "geo.core_impl"),
    ("geo.core_impl", "IMPLEMENTS", "geo.core"),
    ("cpproj.orphan_impl", "IMPLEMENTS_MODULE", "absent.mod_impl"),
    ("cpproj.geo_impl", "DEFINES", "cpproj.geo_impl.helper_g"),
}

CPP_FORBIDDEN = {
    # deferred-impl rule: no IMPLEMENTS link to an interface nobody exports
    ("absent.mod_impl", "IMPLEMENTS", "absent.mod"),
    # pointer receiver typed *Shape must never bind Circle's method
    ("cpproj.shapes.use_param", "CALLS", "cpproj.shapes.h.Circle.area"),
    # the out-of-class impls must NOT mint duplicate provisional entities
    ("cpproj.shapes.Circle", "DEFINES_METHOD", "cpproj.shapes.Circle.area"),
}


DART_DOCS = [
    _doc(
        "dproj/shapes.dart",
        code(
            "abstract class IRender {\n"
            "  void render();\n"
            "}\n\n"
            "class Shape {\n"
            "  double area() {\n"
            "    return 0;\n"
            "  }\n"
            "  Shape ident() => this;\n"
            "}\n\n"
            "class Circle extends Shape implements IRender {\n"
            "  @override\n"
            "  double area() => 3;\n"
            "  void render() {}\n"
            "  void grow() {\n"
            "    this.area();\n"
            "  }\n"
            "}\n"
        ),
    ),
    _doc(
        "dproj/app.dart",
        code(
            "import 'package:dproj/shapes.dart';\n\n"
            "Circle make() {\n"
            "  return Circle();\n"
            "}\n\n"
            "void useLocal() {\n"
            "  final c = Circle();\n"
            "  c.area();\n"
            "  c.ident();\n"
            "}\n\n"
            "void useParam(Shape s) {\n"
            "  s.area();\n"
            "}\n\n"
            "void useChained() {\n"
            "  make().area();\n"
            "}\n"
        ),
    ),
]

DART_EXPECTED = {
    # defines
    ("dproj.shapes", "DEFINES", "dproj.shapes.IRender"),
    ("dproj.shapes", "DEFINES", "dproj.shapes.Shape"),
    ("dproj.shapes", "DEFINES", "dproj.shapes.Circle"),
    ("dproj.app", "DEFINES", "dproj.app.make"),
    ("dproj.app", "DEFINES", "dproj.app.useLocal"),
    ("dproj.app", "DEFINES", "dproj.app.useParam"),
    ("dproj.app", "DEFINES", "dproj.app.useChained"),
    ("dproj.shapes.IRender", "DEFINES_METHOD", "dproj.shapes.IRender.render"),
    ("dproj.shapes.Shape", "DEFINES_METHOD", "dproj.shapes.Shape.area"),
    ("dproj.shapes.Shape", "DEFINES_METHOD", "dproj.shapes.Shape.ident"),
    ("dproj.shapes.Circle", "DEFINES_METHOD", "dproj.shapes.Circle.area"),
    ("dproj.shapes.Circle", "DEFINES_METHOD", "dproj.shapes.Circle.render"),
    ("dproj.shapes.Circle", "DEFINES_METHOD", "dproj.shapes.Circle.grow"),
    # package import
    ("dproj.app", "IMPORTS", "dproj.shapes"),
    # extends → INHERITS; implements targets a CLASS here (abstract class,
    # Dart has no interface keyword) — the resolved label decides, so this
    # stays INHERITS-labeled... no: abstract class parses as `class` kind,
    # so both bases resolve to Class labels → both INHERITS
    ("dproj.shapes.Circle", "INHERITS", "dproj.shapes.Shape"),
    ("dproj.shapes.Circle", "INHERITS", "dproj.shapes.IRender"),
    ("dproj.shapes.Circle.area", "OVERRIDES", "dproj.shapes.Shape.area"),
    ("dproj.shapes.Circle.render", "OVERRIDES", "dproj.shapes.IRender.render"),
    # Dart 2+ ctor calls (no `new`)
    ("dproj.app.make", "INSTANTIATES", "dproj.shapes.Circle"),
    ("dproj.app.useLocal", "INSTANTIATES", "dproj.shapes.Circle"),
    # typed receivers + chained
    ("dproj.app.useLocal", "CALLS", "dproj.shapes.Circle.area"),
    ("dproj.app.useLocal", "CALLS", "dproj.shapes.Shape.ident"),
    ("dproj.app.useParam", "CALLS", "dproj.shapes.Shape.area"),
    ("dproj.app.useChained", "CALLS", "dproj.app.make"),
    ("dproj.app.useChained", "CALLS", "dproj.shapes.Circle.area"),
    ("dproj.shapes.Circle.grow", "CALLS", "dproj.shapes.Circle.area"),
}

DART_FORBIDDEN = {
    ("dproj.app.useLocal", "CALLS", "dproj.shapes.Shape.area"),
    ("dproj.app.useParam", "CALLS", "dproj.shapes.Circle.area"),
}


# connect-style RPC wiring fixture (reference parsers/rpc_exposure.py +
# the RPC arm of io_access/processor.py): server handler wiring + a
# generated-client call meeting on one resource::RPC node
RPC_DOCS = [
    _doc(
        "rpcproj/server/server.go",
        code(
            "package server\n\n"
            "type GreetServer struct{}\n\n"
            "func (s *GreetServer) Greet(req string) string {\n"
            '\treturn "hi"\n'
            "}\n\n"
            "func (s *GreetServer) Farewell(req string) string {\n"
            '\treturn "bye"\n'
            "}\n\n"
            "func (s *GreetServer) helper() {}\n\n"
            "func Wire() {\n"
            "\timpl := &GreetServer{}\n"
            "\tpath, handler := greetconnect.NewGreetServiceHandler(impl)\n"
            "\t_ = path\n"
            "\t_ = handler\n"
            "}\n"
        ),
    ),
    _doc(
        "rpcproj/cli/cli.go",
        code(
            "package cli\n\n"
            "func Run() {\n"
            "\tc := greetconnect.NewGreetServiceClient(nil)\n"
            '\tc.Greet("x")\n'
            "}\n"
        ),
    ),
]

RPC_EXPECTED = {
    # server: exported impl methods EXPOSE the contract's RPC nodes
    # (the unexported helper does not)
    (
        "rpcproj.server.GreetServer.Greet",
        "EXPOSES",
        "resource::RPC::GreetService.Greet",
    ),
    (
        "rpcproj.server.GreetServer.Farewell",
        "EXPOSES",
        "resource::RPC::GreetService.Farewell",
    ),
    # client: request AND response (READ_WRITE) on the SAME node
    ("rpcproj.cli.Run", "READS_FROM", "resource::RPC::GreetService.Greet"),
    ("rpcproj.cli.Run", "WRITES_TO", "resource::RPC::GreetService.Greet"),
}


# contract-linking fixture (reference parsers/contracts.py +
# parsers/contract_linking.py): a .proto contract behind the RPC wiring
# corpus, and an OpenAPI spec behind a decorated web app
CONTRACT_DOCS = RPC_DOCS + [
    _doc(
        "rpcproj/api/greet.proto",
        code(
            'syntax = "proto3";\n'
            "package greet.v1;\n\n"
            "service GreetService {\n"
            "  rpc Greet(GreetRequest) returns (GreetResponse);\n"
            "  rpc Farewell(FarewellRequest) returns (FarewellResponse);\n"
            "}\n\n"
            "message GreetRequest {}\n"
        ),
    ),
    _doc(
        "websvc/app.py",
        code(
            '@app.get("/users/{id}")\n'
            "def get_user(user_id):\n"
            "    return user_id\n\n"
            '@app.post("/users")\n'
            "def create_user():\n"
            "    return 1\n"
        ),
    ),
    _doc(
        "websvc/openapi.json",
        code(
            "{\n"
            '  "openapi": "3.0.0",\n'
            '  "paths": {\n'
            '    "/users/{id}": {"get": {"operationId": "getUser"}},\n'
            '    "/users": {"post": {"operationId": "createUser"}}\n'
            "  }\n"
            "}\n"
        ),
    ),
]

CONTRACT_EXPECTED = {
    # declaring files anchor their operations
    (
        "rpcproj/api/greet.proto",
        "EXPOSES",
        "resource::CONTRACT::rpcproj::greet.v1.GreetService.Greet",
    ),
    (
        "rpcproj/api/greet.proto",
        "EXPOSES",
        "resource::CONTRACT::rpcproj::greet.v1.GreetService.Farewell",
    ),
    (
        "websvc/openapi.json",
        "EXPOSES",
        "resource::CONTRACT::websvc::websvc/openapi.getUser",
    ),
    (
        "websvc/openapi.json",
        "EXPOSES",
        "resource::CONTRACT::websvc::websvc/openapi.createUser",
    ),
    # RPC resources resolve by the bare <Service>.<Method> key
    (
        "resource::RPC::GreetService.Greet",
        "RESOLVES_TO",
        "resource::CONTRACT::rpcproj::greet.v1.GreetService.Greet",
    ),
    (
        "resource::RPC::GreetService.Farewell",
        "RESOLVES_TO",
        "resource::CONTRACT::rpcproj::greet.v1.GreetService.Farewell",
    ),
    # endpoint resources resolve by method + template match
    (
        "endpoint::websvc::GET /users/{id}",
        "RESOLVES_TO",
        "resource::CONTRACT::websvc::websvc/openapi.getUser",
    ),
    (
        "endpoint::websvc::POST /users",
        "RESOLVES_TO",
        "resource::CONTRACT::websvc::websvc/openapi.createUser",
    ),
}


# Ruby tier fixture (extract/rubylite.py). The reference covers Ruby with
# its declarative ast-grep tier (parsers/ast_grep_tier.py +
# ast_grep_patterns/ruby.yaml: def/def self./class/module/require/
# require_relative); rubylite upgrades those shapes to the shared-IR
# conventions (nested QNs, verified requires, `class A < B` INHERITS,
# attr_* methods, call extraction) — each divergence documented in the
# kernel docstring. Gemfile rides the shared manifest registry
# (reference dependency_parser.py GemfileParser).
RUBY_DOCS = [
    _doc(
        "rubyproj/shapes.rb",
        code(
            'require "json"\n'
            "\n"
            "module Geometry\n"
            "  class Shape\n"
            "    attr_accessor :name\n"
            "    def initialize(n)\n"
            "      validate(n)\n"
            "    end\n"
            "    def area\n"
            "      0\n"
            "    end\n"
            "    def describe\n"
            "      area()\n"
            "    end\n"
            "  end\n"
            "\n"
            "  class Circle < Shape\n"
            "    def area\n"
            "      3\n"
            "    end\n"
            "    def self.build(r)\n"
            "      Circle.new(r)\n"
            "    end\n"
            "  end\n"
            "end\n"
            "\n"
            "def validate(x)\n"
            "  x\n"
            "end\n"
            "\n"
            "def top_helper(y)\n"
            "  validate(y)\n"
            "end\n"
        ),
    ),
    _doc(
        "rubyproj/app.rb",
        code(
            'require_relative "shapes"\n'
            "\n"
            "def run_app\n"
            "  top_helper(2)\n"
            "end\n"
        ),
    ),
    _doc(
        "rubyproj/Gemfile",
        code('source "https://rubygems.org"\ngem "rails", "~> 7.0"\n'),
    ),
]

RUBY_EXPECTED = {
    # defines: nested module/class containment
    ("rubyproj.shapes", "DEFINES", "rubyproj.shapes.Geometry"),
    ("rubyproj.shapes.Geometry", "DEFINES", "rubyproj.shapes.Geometry.Shape"),
    ("rubyproj.shapes.Geometry", "DEFINES", "rubyproj.shapes.Geometry.Circle"),
    ("rubyproj.shapes", "DEFINES", "rubyproj.shapes.validate"),
    ("rubyproj.shapes", "DEFINES", "rubyproj.shapes.top_helper"),
    ("rubyproj.app", "DEFINES", "rubyproj.app.run_app"),
    # methods incl. the attr_accessor-minted getter
    (
        "rubyproj.shapes.Geometry.Shape",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Shape.name",
    ),
    (
        "rubyproj.shapes.Geometry.Shape",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Shape.initialize",
    ),
    (
        "rubyproj.shapes.Geometry.Shape",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Shape.area",
    ),
    (
        "rubyproj.shapes.Geometry.Shape",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Shape.describe",
    ),
    (
        "rubyproj.shapes.Geometry.Circle",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Circle.area",
    ),
    (
        "rubyproj.shapes.Geometry.Circle",
        "DEFINES_METHOD",
        "rubyproj.shapes.Geometry.Circle.build",
    ),
    # requires: external gem + verified internal require_relative
    ("rubyproj.shapes", "IMPORTS", "json"),
    ("rubyproj.app", "IMPORTS", "rubyproj.shapes"),
    # class Sub < Base (unique-simple-name rung inside the namespace)
    (
        "rubyproj.shapes.Geometry.Circle",
        "INHERITS",
        "rubyproj.shapes.Geometry.Shape",
    ),
    # Circle#area overrides Shape#area through the INHERITS closure
    (
        "rubyproj.shapes.Geometry.Circle.area",
        "OVERRIDES",
        "rubyproj.shapes.Geometry.Shape.area",
    ),
    # calls: same-module rung, enclosing-scope sibling dispatch,
    # cross-file unique-simple-name fallback
    (
        "rubyproj.shapes.Geometry.Shape.initialize",
        "CALLS",
        "rubyproj.shapes.validate",
    ),
    (
        "rubyproj.shapes.Geometry.Shape.describe",
        "CALLS",
        "rubyproj.shapes.Geometry.Shape.area",
    ),
    ("rubyproj.shapes.top_helper", "CALLS", "rubyproj.shapes.validate"),
    ("rubyproj.app.run_app", "CALLS", "rubyproj.shapes.top_helper"),
    # X.new → INSTANTIATES the class (Ruby ctor; no __init__ redirect)
    (
        "rubyproj.shapes.Geometry.Circle.build",
        "INSTANTIATES",
        "rubyproj.shapes.Geometry.Circle",
    ),
    # Gemfile manifest
    ("rubyproj", "DEPENDS_ON_EXTERNAL", "rails"),
}

RUBY_FORBIDDEN = {
    # sibling dispatch must bind the CALLER's class, not the subclass
    (
        "rubyproj.shapes.Geometry.Shape.describe",
        "CALLS",
        "rubyproj.shapes.Geometry.Circle.area",
    ),
    # the def header must never read as a self-call
    (
        "rubyproj.shapes.Geometry.Circle.build",
        "CALLS",
        "rubyproj.shapes.Geometry.Circle.build",
    ),
    # ctor INSTANTIATES must not double as a CALLS edge to the class
    (
        "rubyproj.shapes.Geometry.Circle.build",
        "CALLS",
        "rubyproj.shapes.Geometry.Circle",
    ),
}


# String-keyed dispatch registries (reference parsers/dispatch_registry.py,
# issue #913; plans/dispatch.py). Exercises: module-level dict registry
# (local + imported handler, all-or-nothing gate), bare/named/non-literal
# registrar decorators, a local def shadowing the registrar name, literal /
# module-constant / deployment-suffixed producers, module-level producer
# scope, and the deployment RESOLVES_TO link.
DISPATCH_DOCS = [
    _doc(
        "dsp/handlers.py",
        code("def audit_handler():\n    return 9\n"),
    ),
    _doc(
        "dsp/tasks.py",
        code(
            "from prefect import flow, task\n"
            "from dsp.handlers import audit_handler\n"
            "\n"
            "def local_handler():\n"
            "    return 1\n"
            "\n"
            "HANDLERS = {\n"
            '    "ingest": local_handler,\n'
            '    "audit": audit_handler,\n'
            "}\n"
            "\n"
            "CONFIG = {\n"
            '    "retries": 3,\n'
            "}\n"
            "\n"
            "BROKEN = {\n"
            '    "lost": missing_handler,\n'
            "}\n"
            "\n"
            "@flow\n"
            "def nightly_sync():\n"
            "    return 2\n"
            "\n"
            '@flow(name="daily-report")\n'
            "def report_job():\n"
            "    return 3\n"
            "\n"
            "@task(name=dynamic())\n"
            "def skipped_job():\n"
            "    return 4\n"
        ),
    ),
    _doc(
        "dsp/fake.py",
        code(
            "def flow(f):\n"
            "    return f\n"
            "\n"
            "@flow\n"
            "def not_registered():\n"
            "    return 5\n"
        ),
    ),
    _doc(
        "dsp/producer.py",
        code(
            'JOB = "ingest"\n'
            "\n"
            "def schedule_all(client):\n"
            '    client.submit(workflow_name="audit")\n'
            "    client.submit(workflow_name=JOB)\n"
            '    client.submit(workflow_name="daily-report/prod")\n'
            "\n"
            'boot(workflow_name="nightly-sync")\n'
        ),
    ),
]

DISPATCH_EXPECTED = {
    # dict registry: local + imported handler EXPOSE their keys
    ("dsp.tasks.local_handler", "EXPOSES", "resource::DISPATCH::ingest"),
    ("dsp.handlers.audit_handler", "EXPOSES", "resource::DISPATCH::audit"),
    # registrar decorators: bare @flow → hyphenated fn name; explicit
    # name= literal wins; non-literal name and shadowed registrar → nothing
    ("dsp.tasks.nightly_sync", "EXPOSES", "resource::DISPATCH::nightly-sync"),
    ("dsp.tasks.report_job", "EXPOSES", "resource::DISPATCH::daily-report"),
    # producers: literal, module-constant, deployment-suffixed, module-level
    ("dsp.producer.schedule_all", "WRITES_TO", "resource::DISPATCH::audit"),
    ("dsp.producer.schedule_all", "WRITES_TO", "resource::DISPATCH::ingest"),
    (
        "dsp.producer.schedule_all",
        "WRITES_TO",
        "resource::DISPATCH::daily-report/prod",
    ),
    ("dsp.producer", "WRITES_TO", "resource::DISPATCH::nightly-sync"),
    # unregistered produced key resolves onto its registered head
    (
        "resource::DISPATCH::daily-report/prod",
        "RESOLVES_TO",
        "resource::DISPATCH::daily-report",
    ),
}

DISPATCH_FORBIDDEN = {
    # a dict with any unresolvable handler is NOT a registry (all-or-nothing)
    ("dsp.tasks.missing_handler", "EXPOSES", "resource::DISPATCH::lost"),
    # a local def named like the registrar is not the external registrar
    ("dsp.fake.not_registered", "EXPOSES", "resource::DISPATCH::not-registered"),
    # an explicit non-literal name is unknowable: no key at all
    ("dsp.tasks.skipped_job", "EXPOSES", "resource::DISPATCH::skipped-job"),
}
