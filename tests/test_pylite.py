"""Unit tests for the pure-Python extraction kernel (no Spark needed)."""

from __future__ import annotations

from code_graph_rag_spark.extract.pylite import (
    doc_extension,
    module_qn_for,
    parse_document,
)


def _by_kind(mentions, kind):
    return [m for m in mentions if m["kind"] == kind]


def test_module_qn_index_collapse():
    assert module_qn_for("proj/__init__.py") == ("proj", "proj")
    assert module_qn_for("proj/a/mod.rs") == ("proj.a", "proj")
    assert module_qn_for("proj/a/b.py") == ("proj.a.b", "proj")
    assert doc_extension("proj/a/b.py") == "py"


def test_defs_and_nesting():
    src = (
        "def outer():\n"
        "    def inner():\n"
        "        pass\n"
        "    inner()\n"
        "\n"
        "class C(Base):\n"
        "    def m(self):\n"
        "        self.h()\n"
        "    def h(self):\n"
        "        pass\n"
    )
    ms = parse_document("p/x.py", src)
    fns = {m["qn"]: m for m in _by_kind(ms, "function")}
    assert "p.x.outer" in fns
    assert "p.x.outer.inner" in fns
    assert fns["p.x.outer.inner"]["parent_qn"] == "p.x.outer"
    methods = {m["qn"]: m for m in _by_kind(ms, "method")}
    assert methods["p.x.C.m"]["parent_qn"] == "p.x.C"
    inh = _by_kind(ms, "inherit")
    assert [(i["qn"], i["callee"], i["base_index"]) for i in inh] == [
        ("p.x.C", "Base", 0)
    ]
    calls = {(c["parent_qn"], c["callee"]) for c in _by_kind(ms, "call")}
    assert ("p.x.outer", "inner") in calls
    assert ("p.x.C.m", "self.h") in calls
    # enclosing-scope hint resolves inner locally
    inner_call = next(c for c in _by_kind(ms, "call") if c["callee"] == "inner")
    assert inner_call.get("enclosing_hint") == "p.x.outer.inner"
    self_call = next(c for c in _by_kind(ms, "call") if c["callee"] == "self.h")
    assert self_call.get("class_ctx_hint") == "p.x.C.h"


def test_imports():
    src = (
        "import os\n"
        "import a.b as ab\n"
        "from pkg.mod import f, g as h\n"
        "from . import sibling\n"
    )
    ms = parse_document("p/sub/x.py", src)
    imps = {(m["local_name"], m["target"], m["name"]) for m in _by_kind(ms, "import")}
    assert ("os", "os", None) in imps
    assert ("ab", "a.b", None) in imps
    assert ("f", "pkg.mod", "f") in imps
    assert ("h", "pkg.mod", "g") in imps
    assert ("sibling", "p.sub", "sibling") in imps


def test_strings_and_comments_ignored():
    src = (
        "def f():\n"
        "    x = 'call_me()'\n"
        "    # call_me()\n"
        '    """\n'
        "    call_me()\n"
        '    """\n'
        "    real()\n"
    )
    ms = parse_document("p/x.py", src)
    calls = [c["callee"] for c in _by_kind(ms, "call")]
    assert calls == ["real"]


def test_docstring_captured():
    src = 'def f():\n    """Does things."""\n    pass\n'
    ms = parse_document("p/x.py", src)
    fn = _by_kind(ms, "function")[0]
    assert '"docstring": "Does things."' in fn["props"]


def test_decorators():
    src = "@app.route\ndef f():\n    pass\n"
    ms = parse_document("p/x.py", src)
    fn = _by_kind(ms, "function")[0]
    assert "app.route" in fn["props"]


def test_references_only_for_local_defs():
    src = (
        "def cb():\n    pass\n\n"
        "def use():\n    register(cb)\n    x = unknown_var\n"
    )
    ms = parse_document("p/x.py", src)
    refs = [(r["parent_qn"], r["callee"]) for r in _by_kind(ms, "ref")]
    assert ("p.x.use", "cb") in refs
    assert all(r[1] != "unknown_var" for r in refs)


def test_determinism():
    src = "def a():\n    b()\n\ndef b():\n    pass\n"
    assert parse_document("p/x.py", src) == parse_document("p/x.py", src)


def test_gemfile_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import parse_document

    src = (
        'source "https://rubygems.org"\n\n'
        'gem "rails", "~> 7.1"\n'
        'gem "puma"\n'
        "group :development do\n"
        '  gem "rspec-rails", "6.1.0"\n'
        "end\n"
    )
    ms = parse_document("rbproj/Gemfile", src)
    deps = {
        (m["name"], __import__("json").loads(m["props"])["version_spec"])
        for m in ms
        if m["kind"] == "dependency"
    }
    assert deps == {
        ("rails", "~> 7.1"),
        ("puma", ""),
        ("rspec-rails", "6.1.0"),
    }


def test_composer_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import parse_document

    src = (
        "{\n"
        '  "name": "acme/app",\n'
        '  "require": {\n'
        '    "php": ">=8.1",\n'
        '    "monolog/monolog": "^3.0"\n'
        "  },\n"
        '  "require-dev": {\n'
        '    "phpunit/phpunit": "^10"\n'
        "  }\n"
        "}\n"
    )
    ms = parse_document("phpproj/composer.json", src)
    deps = {m["name"] for m in ms if m["kind"] == "dependency"}
    # php pseudo-package excluded (reference ComposerJsonParser)
    assert deps == {"monolog/monolog", "phpunit/phpunit"}


def test_csproj_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import parse_document

    src = (
        '<Project Sdk="Microsoft.NET.Sdk">\n'
        "  <ItemGroup>\n"
        '    <PackageReference Include="Newtonsoft.Json" Version="13.0.3" />\n'
        '    <PackageReference Version="8.0.0" Include="Serilog" />\n'
        '    <ProjectReference Include="../Lib/Lib.csproj" />\n'
        "  </ItemGroup>\n"
        "</Project>\n"
    )
    ms = parse_document("csproj1/App.csproj", src)
    deps = {
        (m["name"], __import__("json").loads(m["props"])["version_spec"])
        for m in ms
        if m["kind"] == "dependency"
    }
    # ProjectReference is not a package dependency (reference CsprojParser
    # iterates PackageReference only)
    assert deps == {("Newtonsoft.Json", "13.0.3"), ("Serilog", "8.0.0")}


def test_pubspec_manifest_dependencies():
    from code_graph_rag_spark.extract.pylite import parse_document

    src = (
        "name: dartproj\n"
        "environment:\n"
        "  sdk: ^3.0.0\n"
        "dependencies:\n"
        "  http: ^1.2.0\n"
        "  flutter:\n"
        "    sdk: flutter\n"
        "dev_dependencies:\n"
        "  test: ^1.24.0\n"
    )
    ms = parse_document("dartproj/pubspec.yaml", src)
    deps = {
        (m["name"], __import__("json").loads(m["props"])["version_spec"])
        for m in ms
        if m["kind"] == "dependency"
    }
    # nested block keys (sdk: flutter) are skipped; the parent key is
    # recorded name-only (reference PubspecYamlParser indent rule)
    assert deps == {("http", "^1.2.0"), ("flutter", ""), ("test", "^1.24.0")}
