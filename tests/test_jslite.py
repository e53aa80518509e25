"""JS/TS extraction kernel tests (pure Python — no Spark session needed).

Mirrors the reference's js_ts tier coverage shape (tests/test_js_* /
test_javascript_async_patterns.py): declarations, arrow naming, ESM/CJS
imports, exports, classes/extends/methods, this/super dispatch hints,
TS interface/enum/annotations.
"""

from __future__ import annotations

from code_graph_rag_spark.extract.jslite import parse_document, resolve_specifier


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_specifier_resolution():
    assert resolve_specifier("./util", "proj/app.js") == "proj.util"
    assert resolve_specifier("../lib/core", "proj/sub/app.js") == "proj.lib.core"
    assert resolve_specifier("./dir/index", "proj/app.js") == "proj.dir"
    assert resolve_specifier("./util.js", "proj/app.js") == "proj.util"
    assert resolve_specifier("lodash/fp", "proj/app.js") == "lodash.fp"
    assert resolve_specifier("react", "proj/app.js") == "react"


def test_functions_and_arrows():
    src = (
        "export function top(x) {\n"
        "  return helper(x);\n"
        "}\n"
        "export const arrow = (a, b) => {\n"
        "  return a + b;\n"
        "};\n"
        "const expr = x => x * 2;\n"
        "const fnExpr = function (y) { return y; };\n"
        "items.map((it) => it.x);\n"
    )
    ms = parse_document("proj/app.js", src)
    fns = {m["qn"]: m for m in _by_kind(ms, "function")}
    assert "proj.app.top" in fns
    assert "proj.app.arrow" in fns
    assert "proj.app.expr" in fns
    assert "proj.app.fnExpr" in fns
    anons = [q for q in fns if ".lambda_" in q]
    assert len(anons) == 1 and anons[0].startswith("proj.app.lambda_9_")
    # brace bodies close at the right lines
    assert fns["proj.app.top"]["end_line"] == 3
    assert fns["proj.app.arrow"]["end_line"] == 6
    exports = {m["name"] for m in _by_kind(ms, "export")}
    assert {"top", "arrow"} <= exports


def test_esm_cjs_imports():
    src = (
        "import Default from '../lib/core';\n"
        "import { a, b as bee } from './named';\n"
        "import * as ns from './space';\n"
        "import './side-effect';\n"
        "const legacy = require('./legacy');\n"
        "const { c, d: dee } = require('../shared');\n"
    )
    ms = parse_document("proj/sub/app.js", src)
    imps = {(m["local_name"], m["target"]) for m in _by_kind(ms, "import")}
    assert ("Default", "proj.lib.core") in imps
    assert ("a", "proj.sub.named") in imps
    assert ("bee", "proj.sub.named") in imps
    assert ("ns", "proj.sub.space") in imps
    assert ("legacy", "proj.sub.legacy") in imps
    assert ("c", "proj.shared") in imps
    assert ("dee", "proj.shared") in imps
    # named alias keeps the ORIGINAL symbol for import-target verification
    by_local = {m["local_name"]: m for m in _by_kind(ms, "import")}
    assert by_local["bee"]["name"] == "b"


def test_class_methods_this_super():
    src = (
        "class Widget extends Base {\n"
        "  constructor() {\n"
        "    super.init();\n"
        "    this.size = 1;\n"
        "  }\n"
        "  area() {\n"
        "    return this.grow();\n"
        "  }\n"
        "  grow() { return 2; }\n"
        "  static async fetchAll() { return []; }\n"
        "}\n"
    )
    ms = parse_document("proj/w.js", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"proj.w.Widget"}
    meths = {m["qn"]: m for m in _by_kind(ms, "method")}
    assert set(meths) == {
        "proj.w.Widget.constructor",
        "proj.w.Widget.area",
        "proj.w.Widget.grow",
        "proj.w.Widget.fetchAll",
    }
    inh = _by_kind(ms, "inherit")
    assert [(m["qn"], m["callee"], m["base_index"]) for m in inh] == [
        ("proj.w.Widget", "Base", 0)
    ]
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["super().init"]["super_hint"] == "proj.w.Widget"
    assert calls["this.grow"]["class_ctx_hint"] == "proj.w.Widget.grow"
    assert calls["this.grow"]["parent_qn"] == "proj.w.Widget.area"


def test_new_ctor_and_receiver_types():
    src = (
        "import { Widget } from './w';\n"
        "function make() {\n"
        "  return new Widget();\n"
        "}\n"
        "function use() {\n"
        "  const w = new Widget();\n"
        "  w.area();\n"
        "  make().area();\n"
        "}\n"
    )
    ms = parse_document("proj/app.js", src)
    calls = [(m["callee"], m.get("recv_expr"), m.get("is_ret")) for m in _by_kind(ms, "call")]
    assert ("Widget", None, True) in calls  # return new Widget()
    assert ("w.area", "Widget", False) in calls  # var receiver type
    assert ("make().area", "make", False) in calls  # chained on call result
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("proj.app.make", "Widget") in rets


def test_nested_function_enclosing_hint():
    src = (
        "function outer() {\n"
        "  function helper() { return 1; }\n"
        "  return helper();\n"
        "}\n"
        "function helper() { return 2; }\n"
        "function top() { return helper(); }\n"
    )
    ms = parse_document("proj/n.js", src)
    calls = {
        (m["parent_qn"], m["callee"]): m.get("enclosing_hint")
        for m in _by_kind(ms, "call")
    }
    assert calls[("proj.n.outer", "helper")] == "proj.n.outer.helper"
    assert calls[("proj.n.top", "helper")] is None


def test_ts_interface_enum_annotations():
    src = (
        "export interface Renderable {\n"
        "  render(): number;\n"
        "}\n"
        "enum Color { RED = 1 }\n"
        "export class Disk implements Renderable {\n"
        "  render(): number { return 1; }\n"
        "}\n"
        "function usePara(s: Disk) {\n"
        "  s.render();\n"
        "}\n"
    )
    ms = parse_document("proj/r.ts", src)
    kinds = {m["kind"]: m for m in ms if m["kind"] in ("interface", "enum")}
    assert kinds["interface"]["qn"] == "proj.r.Renderable"
    assert kinds["enum"]["qn"] == "proj.r.Color"
    inh = [(m["qn"], m["callee"]) for m in _by_kind(ms, "inherit")]
    assert ("proj.r.Disk", "Renderable") in inh
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["s.render"]["recv_expr"] == "Disk"  # annotated param type


def test_strings_comments_templates_ignored():
    src = (
        "// fake(); in a comment\n"
        "/* block fake2();\n"
        "   still comment fake3(); */\n"
        "const s = 'fake4()';\n"
        "const t = `template fake5() ${real()}`;\n"
        "real2();\n"
    )
    ms = parse_document("proj/s.js", src)
    callees = {m["callee"] for m in _by_kind(ms, "call")}
    assert "real2" in callees
    assert not {"fake", "fake2", "fake3", "fake4"} & callees


def test_module_exports_cjs():
    src = (
        "function a() {}\n"
        "function b() {}\n"
        "module.exports = { a, b };\n"
    )
    ms = parse_document("proj/m.cjs", src)
    assert {m["name"] for m in _by_kind(ms, "export")} == {"a", "b"}
