"""rubylite kernel tests (pure Python, no Spark).

Shapes from the reference's ast-grep Ruby tier
(``parsers/ast_grep_tier.py`` + ``ast_grep_patterns/ruby.yaml``:
def / def self. / class / module / require / require_relative), upgraded
to the shared-IR conventions (nested QNs, INHERITS, attr_* methods,
calls) — divergences documented in the kernel docstring.
"""

from __future__ import annotations

from code_graph_rag_spark.extract.rubylite import parse_document


def _by_kind(rows, kind):
    return [m for m in rows if m["kind"] == kind]


def test_module_and_flat_defs():
    rows = parse_document(
        "proj/util.rb",
        "def helper(x)\n  x\nend\n\ndef self_test\n  1\nend\n",
    )
    mod = rows[0]
    assert mod["kind"] == "module" and mod["qn"] == "proj.util"
    fns = {m["qn"]: m for m in _by_kind(rows, "function")}
    assert set(fns) == {"proj.util.helper", "proj.util.self_test"}
    assert fns["proj.util.helper"]["parent_kind"] == "Module"


def test_nested_module_class_defs_and_self_methods():
    rows = parse_document(
        "proj/geo.rb",
        "module Geo\n"
        "  class Shape\n"
        "    def area\n"
        "      0\n"
        "    end\n"
        "    def self.build\n"
        "      Shape.new\n"
        "    end\n"
        "  end\n"
        "end\n",
    )
    classes = {m["qn"] for m in _by_kind(rows, "class")}
    assert classes == {"proj.geo.Geo", "proj.geo.Geo.Shape"}
    methods = {m["qn"] for m in _by_kind(rows, "method")}
    assert methods == {"proj.geo.Geo.Shape.area", "proj.geo.Geo.Shape.build"}
    # spans close on `end`
    shape = next(m for m in _by_kind(rows, "class") if m["name"] == "Shape")
    assert shape["start_line"] == 2 and shape["end_line"] == 9


def test_requires_and_gem_style_paths():
    rows = parse_document(
        "proj/app.rb",
        'require "json"\n'
        "require_relative './lib/util'\n"
        'require("active_support/core_ext")\n',
    )
    imps = {(m["target"], m["local_name"]) for m in _by_kind(rows, "import")}
    assert imps == {
        ("json", "json"),
        ("lib.util", "util"),
        ("active_support.core_ext", "core_ext"),
    }


def test_class_inheritance_and_scope_resolution_operator():
    rows = parse_document(
        "proj/m.rb",
        "module NS\n  class Base\n  end\n"
        "  class Sub < NS::Base\n  end\nend\n",
    )
    inh = _by_kind(rows, "inherit")
    assert len(inh) == 1
    assert inh[0]["qn"] == "proj.m.NS.Sub"
    assert inh[0]["callee"] == "NS.Base"


def test_attr_accessor_mints_methods():
    rows = parse_document(
        "proj/a.rb",
        "class C\n  attr_accessor :x, :y\n  attr_reader :z\nend\n",
    )
    methods = {m["name"] for m in _by_kind(rows, "method")}
    assert methods == {"x", "y", "z"}
    assert all(
        m["parent_qn"] == "proj.a.C" for m in _by_kind(rows, "method")
    )


def test_attr_outside_class_ignored():
    rows = parse_document("proj/b.rb", "attr_accessor :x\n")
    assert not _by_kind(rows, "method")


def test_calls_ctor_rewrite_and_enclosing_hint():
    rows = parse_document(
        "proj/c.rb",
        "module M\n"
        "  class K\n"
        "    def go\n"
        "      step()\n"
        "    end\n"
        "    def step\n"
        "      1\n"
        "    end\n"
        "  end\n"
        "  class U\n"
        "    def mk\n"
        "      K.new\n"
        "    end\n"
        "  end\n"
        "end\n",
    )
    calls = {m["callee"]: m for m in _by_kind(rows, "call")}
    # sibling dispatch: hint binds the enclosing class
    assert calls["step"]["enclosing_hint"] == "proj.c.M.K.step"
    # ctor rewrite: K.new → K, hinted to the enclosing module's class
    assert calls["K"]["enclosing_hint"] == "proj.c.M.K"


def test_def_header_line_emits_no_call():
    rows = parse_document(
        "proj/d.rb", "def wrapper(fn)\n  fn\nend\n"
    )
    assert not _by_kind(rows, "call")


def test_comments_and_strings_blanked():
    rows = parse_document(
        "proj/e.rb",
        '# def ghost\nx = "def quoted; end"\nputs("#{x}")\n',
    )
    assert not _by_kind(rows, "function")


def test_endless_and_oneline_defs_do_not_push_scope():
    rows = parse_document(
        "proj/f.rb",
        "class C\n"
        "  def square(x) = x * x\n"
        "  def late\n"
        "    1\n"
        "  end\n"
        "end\n",
    )
    methods = {m["qn"] for m in _by_kind(rows, "method")}
    assert methods == {"proj.f.C.square", "proj.f.C.late"}


def test_block_do_end_balance():
    rows = parse_document(
        "proj/g.rb",
        "class C\n"
        "  def iter(xs)\n"
        "    xs.each do |x|\n"
        "      handle(x)\n"
        "    end\n"
        "  end\n"
        "end\n"
        "def handle(x)\n"
        "  x\n"
        "end\n",
    )
    c = next(m for m in _by_kind(rows, "class") if m["name"] == "C")
    assert c["end_line"] == 7
    fns = {m["qn"] for m in _by_kind(rows, "function")}
    assert "proj.g.handle" in fns
    # the call inside the block is attributed to the enclosing method
    call = next(m for m in _by_kind(rows, "call") if m["callee"] == "handle")
    assert call["parent_qn"] == "proj.g.C.iter"
