"""Rust extraction kernel tests (pure Python — no Spark session)."""

from __future__ import annotations

from code_graph_rag_spark.extract.rustlite import parse_document


def _by_kind(ms, kind):
    return [m for m in ms if m["kind"] == kind]


def test_struct_impl_methods():
    src = (
        "pub struct Circle;\n"
        "impl Circle {\n"
        "    pub fn new() -> Self { Circle }\n"
        "    pub fn area(&self) -> f64 { 3.0 }\n"
        "}\n"
    )
    ms = parse_document("rproj/shapes.rs", src)
    assert {m["qn"] for m in _by_kind(ms, "class")} == {"rproj.shapes.Circle"}
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {"rproj.shapes.Circle.new", "rproj.shapes.Circle.area"}
    # `-> Self` return annotation resolves to the impl type at extraction
    rets = {(m["parent_qn"], m["callee"]) for m in _by_kind(ms, "returns")}
    assert ("rproj.shapes.Circle.new", "Circle") in rets


def test_lifetime_generics_not_strings():
    # jslite's stripper treated ' as a string delimiter, blanking the rest
    # of every lifetime-annotated line; methods inside impl<'a> blocks were
    # emitted as module-level functions and their calls lost
    src = (
        "pub struct Holder<'a> {\n"
        "    name: &'a str,\n"
        "}\n"
        "impl<'a> Holder<'a> {\n"
        "    pub fn label(&self) -> &'a str {\n"
        "        self.helper()\n"
        "    }\n"
        "    fn helper(&self) -> &'a str {\n"
        "        self.name\n"
        "    }\n"
        "}\n"
    )
    ms = parse_document("rproj/holder.rs", src)
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert meths == {
        "rproj.holder.Holder.label",
        "rproj.holder.Holder.helper",
    }
    calls = {
        (m["parent_qn"], m["callee"])
        for m in _by_kind(ms, "call")
    }
    assert ("rproj.holder.Holder.label", "self.helper") in calls


def test_char_literals_still_strip():
    # 'x' IS a char literal — the delimiter inside must not leak tokens
    src = (
        "fn ch() -> char {\n"
        "    let c = '(';\n"
        "    helper();\n"
        "    c\n"
        "}\n"
        "fn helper() {}\n"
    )
    ms = parse_document("rproj/lit.rs", src)
    calls = {m["callee"] for m in _by_kind(ms, "call")}
    assert calls == {"helper"}


def test_trait_impl_for_lifetime():
    src = (
        "pub trait Render {\n"
        "    fn render(&self);\n"
        "}\n"
        "pub struct Holder<'a> { name: &'a str }\n"
        "impl<'a> Render for Holder<'a> {\n"
        "    fn render(&self) {}\n"
        "}\n"
    )
    ms = parse_document("rproj/t.rs", src)
    inh = {
        (m["qn"], m["target"]) if "target" in m else (m.get("qn"), m.get("callee"))
        for m in _by_kind(ms, "inherit")
    }
    assert len(_by_kind(ms, "inherit")) == 1
    meths = {m["qn"] for m in _by_kind(ms, "method")}
    assert "rproj.t.Holder.render" in meths
    _ = inh


def test_chained_call_receiver():
    src = (
        "pub fn make() -> Circle {\n"
        "    Circle::new()\n"
        "}\n"
        "pub fn use_chained() {\n"
        "    make().area();\n"
        "}\n"
    )
    ms = parse_document("rproj/app.rs", src)
    chained = [
        m
        for m in _by_kind(ms, "call")
        if m.get("recv_expr") and m["callee"].endswith("().area")
    ]
    assert len(chained) == 1
    assert chained[0]["recv_expr"] == "make"
    assert chained[0]["parent_qn"] == "rproj.app.use_chained"


def test_self_chained_call_qualifies_to_impl_type():
    src = (
        "pub struct W;\n"
        "impl W {\n"
        "    fn inner(&self) -> W { W }\n"
        "    fn outer(&self) {\n"
        "        self.inner().run();\n"
        "    }\n"
        "    fn run(&self) {}\n"
        "}\n"
    )
    ms = parse_document("rproj/w.rs", src)
    chained = [
        m for m in _by_kind(ms, "call") if m["callee"].endswith("().run")
    ]
    assert len(chained) == 1
    assert chained[0]["recv_expr"] == "W.inner"
