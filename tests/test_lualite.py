"""Lua extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.lualite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_table_as_class_with_methods():
    src = (
        "local Circle = {}\n"
        "Circle.__index = Circle\n\n"
        "function Circle.new(r)\n"
        "    return setmetatable({}, Circle)\n"
        "end\n\n"
        "function Circle:area()\n"
        "    return 3\n"
        "end\n"
    )
    ms = parse_document("lproj/shapes.lua", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"lproj.shapes.Circle"}
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "lproj.shapes.Circle.new",
        "lproj.shapes.Circle.area",
    }
    # constructor pattern → returns fact
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("lproj.shapes.Circle.new", "Circle") in rets


def test_require_binding_and_calls():
    src = (
        'local shapes = require("lproj.shapes")\n'
        'require "lproj.extra"\n\n'
        "local function use()\n"
        "    local c = shapes.Circle.new(2)\n"
        "    c:area()\n"
        "end\n"
    )
    ms = parse_document("lproj/app.lua", src)
    imps = {(m["local_name"], m["target"]) for m in _by_kind(ms, "import")}
    assert imps == {
        ("shapes", "lproj.shapes"),
        ("extra", "lproj.extra"),
    }
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["shapes.Circle.new"]["parent_qn"] == "lproj.app.use"
    # var bound from a call → fn-return hop receiver
    assert calls["c.area"]["recv_expr"] == "shapes.Circle.new"


def test_setmetatable_inheritance():
    src = (
        "local Base = {}\n"
        "function Base:run() end\n\n"
        "local Sub = setmetatable({}, {__index = Base})\n"
        "function Sub:go()\n"
        "    self:run()\n"
        "end\n"
    )
    ms = parse_document("lproj/inh.lua", src)
    inh = {
        (m["qn"], m["callee"], m["base_index"])
        for m in _by_kind(ms, "inherit")
    }
    assert inh == {("lproj.inh.Sub", "Base", 0)}
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert (
        calls["self.run"]["class_ctx_hint"] == "lproj.inh.Sub.run"
    )


def test_self_dispatch_and_export():
    src = (
        "local M = {}\n"
        "function M:a()\n"
        "    self:b()\n"
        "end\n"
        "function M:b() end\n"
        "return M\n"
    )
    ms = parse_document("lproj/m.lua", src)
    exps = {m["name"] for m in _by_kind(ms, "export")}
    assert exps == {"M"}
    calls = {m["callee"]: m for m in _by_kind(ms, "call")}
    assert calls["self.b"]["class_ctx_hint"] == "lproj.m.M.b"
    assert calls["self.b"]["parent_kind"] == "Method"


def test_init_lua_collapses():
    ms = parse_document("lproj/pkg/init.lua", "local x = 1\n")
    assert ms[0]["kind"] == "module" and ms[0]["qn"] == "lproj.pkg"


def test_comments_and_long_strings_stripped():
    src = (
        "-- local Fake = {}\n"
        "--[[ function Dead:gone()\n"
        "end ]]\n"
        'local s = [[ call_inside_string() ]]\n'
        "local function real()\n"
        "    work()\n"
        "end\n"
    )
    ms = parse_document("lproj/c.lua", src)
    assert {m["qn"] for m in _by_kind(ms, "function")} == {"lproj.c.real"}
    calls = {m["callee"] for m in _by_kind(ms, "call")}
    assert calls == {"work"}


def test_no_def_header_self_calls():
    src = (
        "local M = {}\n"
        "function M.make()\n"
        "    return 1\n"
        "end\n"
    )
    ms = parse_document("lproj/h.lua", src)
    assert not _by_kind(ms, "call")


def test_return_table_module_system_mentions():
    src = "local M = {}\nfunction M.f()\nend\nreturn M\n"
    ms = parse_document("lproj/mod.lua", src)
    mi = _by_kind(ms, "module_interface")
    mp = _by_kind(ms, "module_impl")
    assert [m["target"] for m in mi] == ["lproj.mod::M"]
    assert [m["target"] for m in mp] == ["lproj.mod::M"]
    # a bare value return is not a module interface
    ms2 = parse_document("lproj/val.lua", "return 42\n")
    assert not _by_kind(ms2, "module_interface")
