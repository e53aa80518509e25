"""Deterministic fixture corpora in the interleaved-span documents shape.

The driver contract fixes the input as ``(doc_id, spans: array<struct<kind,
text, media_ref, offset>>)``. These fixtures mirror the reference's test
repos (``codebase_rag/tests/test_graph_updater_integration.py:10-24`` for
slice-0; the polyglot eval corpus shape, ``evals/README.md:343-368``) and the
expected triples are hand-derived from the reference's own test assertions
and documented semantics — the extraction-parity oracle (FIXTURES.md §1a/§1b).

Everything is seeded/static: two calls produce byte-identical tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


def _doc(doc_id: str, *spans: tuple[str, str, str]) -> dict:
    """spans as (kind, text, media_ref); offsets assigned in order."""
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i * 10}
            for i, (k, t, m) in enumerate(spans)
        ],
    }


def code(text: str) -> tuple[str, str, str]:
    return ("code", text, "")


def media(ref: str) -> tuple[str, str, str]:
    return ("media", "", ref)


def docstring(text: str) -> tuple[str, str, str]:
    return ("docstring", text, "")


# ---------------------------------------------------------------------------
# Slice 0 — the reference's two-file CALLS integration test
# ---------------------------------------------------------------------------

SLICE0_DOCS = [
    _doc("proj/__init__.py", code("")),
    _doc("proj/utils.py", code("def util_func():\n    pass\n")),
    _doc(
        "proj/main.py",
        code("from utils import util_func\n\n"),
        code(
            "def main_func():\n    util_func()\n    local_func()\n\n"
            "def local_func():\n    pass\n"
        ),
    ),
]

# exact tuples the reference test asserts (test_graph_updater_integration.py:
# 40-51) plus the structural triples its audit implies
SLICE0_EXPECTED = {
    ("proj.main.main_func", "CALLS", "proj.utils.util_func"),
    ("proj.main.main_func", "CALLS", "proj.main.local_func"),
    ("proj.main", "IMPORTS", "proj.utils"),
    ("proj.main", "DEFINES", "proj.main.main_func"),
    ("proj.main", "DEFINES", "proj.main.local_func"),
    ("proj.utils", "DEFINES", "proj.utils.util_func"),
}

# ---------------------------------------------------------------------------
# Polyglot corpus — FIXTURES.md §1b: basename collision, inheritance diamond,
# duplicate-QN variants, external-import suppression, nested defs, media
# spans interleaved between code spans.
# ---------------------------------------------------------------------------

POLYGLOT_DOCS = [
    _doc("poly/__init__.py", code("")),
    # media + docstring spans interleaved — must pass through untouched
    _doc(
        "poly/shapes.py",
        code(
            "class Shape:\n    def area(self):\n        pass\n"
            "    def ident(self):\n        return self\n\n"
        ),
        media("assets/shape-diagram.png"),
        code(
            "class Circle(Shape):\n    def area(self):\n        return 3\n\n"
            "class Square(Shape):\n    def area(self):\n        return 4\n\n"
        ),
        code(
            "class FancySquare(Circle, Square):\n    def area(self):\n"
            "        return self.side()\n    def side(self):\n        return 2\n"
        ),
    ),
    # basename collision: later (sorted) doc gets module qn 'poly.shapes.rs'
    _doc(
        "poly/shapes.rs",
        code("def rs_area():\n    pass\n"),
    ),
    # duplicate QN in one module → variant minting store@1 / store@5 analogue
    _doc(
        "poly/dup.py",
        code(
            "def store():\n    pass\n\n\n"
            "def store():\n    pass\n\n"
            "def use_store():\n    store()\n"
        ),
    ),
    # external import must NOT bind to the same-named local symbol
    _doc(
        "poly/ext.py",
        code(
            "import requests\n"
            "from poly.shapes import Circle\n\n"
            "def get():\n    pass\n\n"
            "def fetch():\n    requests.get('u')\n"
            "    c = Circle()\n"
            "    return c\n"
        ),
    ),
    # nested defs: enclosing-scope rung beats same-module
    _doc(
        "poly/nested.py",
        docstring('"""module docs"""'),
        code(
            "def outer():\n"
            "    def helper():\n"
            "        pass\n"
            "    helper()\n"
            "    return helper\n\n"
            "def helper():\n    pass\n\n"
            "def top():\n    helper()\n"
        ),
    ),
    # interface/enum kinds, IMPLEMENTS, super() dispatch, inherited self-call
    _doc(
        "poly/render.py",
        code(
            "interface Renderable:\n    def render(self):\n        pass\n\n"
            "enum Color:\n    RED = 1\n\n"
            "class Disk(Renderable):\n    def render(self):\n        return 1\n\n"
            "class BigDisk(Disk):\n"
            "    def render(self):\n        return super().render()\n"
            "    def draw(self):\n        return self.render()\n"
        ),
    ),
    # __all__ exports
    _doc(
        "poly/pub.py",
        code("__all__ = ['visible']\n\ndef visible():\n    pass\n\ndef hidden():\n    pass\n"),
    ),
    # dependency manifest
    _doc("poly/requirements.txt", code("numpy==1.26\nrequests>=2.0\n")),
    # media span INSIDE a function body (true interleaving): the span-
    # containment range join must attribute the asset to render_doc, not
    # the module
    _doc(
        "poly/media.py",
        code("def render_doc():\n    a = 1\n"),
        media("assets/inline-figure.png"),
        code("    return a\n"),
    ),
    # MRO sibling shadow: SearchMixin.combine shadows Combinable.combine
    # only inside Search's MRO (reference method_override.py:70-153, the
    # django SearchVector._combine case)
    _doc(
        "poly/mixin.py",
        code(
            "class Combinable:\n    def combine(self):\n        return 0\n\n"
            "class SearchMixin:\n    def combine(self):\n        return 1\n\n"
            "class Search(SearchMixin, Combinable):\n    pass\n"
        ),
    ),
    # local-variable / parameter / return type inference + chained calls +
    # recursion (reference parsers/type_inference.py, call_resolver.py:833-850,
    # tests/test_nested_local_function_calls.py:50-60)
    _doc(
        "poly/typing.py",
        code(
            "from poly.shapes import Circle, Shape\n\n"
            "def make():\n    return Circle()\n\n"
            "def use_local():\n"
            "    c = Circle()\n"
            "    c.area()\n"
            "    c.ident()\n"
            "    return c\n\n"
            "def use_returned():\n    m = make()\n    m.area()\n\n"
            "def use_chained():\n    make().area()\n    Circle().area()\n\n"
            "def use_param(s: Shape):\n    s.area()\n\n"
            "def rebound():\n    c = Circle()\n    c = 5\n    c.area()\n\n"
            "def use_untyped():\n    h = helper_obj()\n    h.get()\n\n"
            "def recurse(n):\n    if n:\n        recurse(n - 1)\n"
        ),
    ),
]

# Hand-derived from the reference's documented semantics (each rule cited in
# FIXTURES.md / SURVEY.md): the P/R oracle for the polyglot corpus.
POLYGLOT_EXPECTED = {
    # structure: DEFINES / DEFINES_METHOD
    ("poly.shapes", "DEFINES", "poly.shapes.Shape"),
    ("poly.shapes", "DEFINES", "poly.shapes.Circle"),
    ("poly.shapes", "DEFINES", "poly.shapes.Square"),
    ("poly.shapes", "DEFINES", "poly.shapes.FancySquare"),
    ("poly.shapes.Shape", "DEFINES_METHOD", "poly.shapes.Shape.area"),
    ("poly.shapes.Shape", "DEFINES_METHOD", "poly.shapes.Shape.ident"),
    ("poly.shapes.Circle", "DEFINES_METHOD", "poly.shapes.Circle.area"),
    ("poly.shapes.Square", "DEFINES_METHOD", "poly.shapes.Square.area"),
    ("poly.shapes.FancySquare", "DEFINES_METHOD", "poly.shapes.FancySquare.area"),
    ("poly.shapes.FancySquare", "DEFINES_METHOD", "poly.shapes.FancySquare.side"),
    # basename collision: poly/shapes.rs → module poly.shapes.rs
    ("poly.shapes.rs", "DEFINES", "poly.shapes.rs.rs_area"),
    # duplicate-QN variants: first keeps plain, second @<line>
    ("poly.dup", "DEFINES", "poly.dup.store"),
    ("poly.dup", "DEFINES", "poly.dup.store@5"),
    ("poly.dup", "DEFINES", "poly.dup.use_store"),
    # call to duplicated name links to every variant
    ("poly.dup.use_store", "CALLS", "poly.dup.store"),
    ("poly.dup.use_store", "CALLS", "poly.dup.store@5"),
    # inheritance diamond with base order
    ("poly.shapes.Circle", "INHERITS", "poly.shapes.Shape"),
    ("poly.shapes.Square", "INHERITS", "poly.shapes.Shape"),
    ("poly.shapes.FancySquare", "INHERITS", "poly.shapes.Circle"),
    ("poly.shapes.FancySquare", "INHERITS", "poly.shapes.Square"),
    # overrides: nearest ancestor providing the method
    ("poly.shapes.Circle.area", "OVERRIDES", "poly.shapes.Shape.area"),
    ("poly.shapes.Square.area", "OVERRIDES", "poly.shapes.Shape.area"),
    ("poly.shapes.FancySquare.area", "OVERRIDES", "poly.shapes.Circle.area"),
    # self-sibling method call
    ("poly.shapes.FancySquare.area", "CALLS", "poly.shapes.FancySquare.side"),
    # external import: IMPORTS to ExternalModule; requests.get must NOT bind
    # to poly.ext.get (suppression rung) → no CALLS edge for it
    ("poly.ext", "IMPORTS", "requests"),
    ("poly.ext", "IMPORTS", "poly.shapes"),
    ("poly.ext", "DEFINES", "poly.ext.get"),
    ("poly.ext", "DEFINES", "poly.ext.fetch"),
    ("poly.ext.fetch", "INSTANTIATES", "poly.shapes.Circle"),
    # nested defs: enclosing-scope rung wins inside outer(); module-level
    # call binds the module-level helper
    ("poly.nested", "DEFINES", "poly.nested.outer"),
    ("poly.nested.outer", "DEFINES", "poly.nested.outer.helper"),
    ("poly.nested", "DEFINES", "poly.nested.helper"),
    ("poly.nested", "DEFINES", "poly.nested.top"),
    ("poly.nested.outer", "CALLS", "poly.nested.outer.helper"),
    ("poly.nested.top", "CALLS", "poly.nested.helper"),
    ("poly.nested.outer", "REFERENCES", "poly.nested.outer.helper"),
    # interface/enum entities, IMPLEMENTS vs INHERITS split
    ("poly.render", "DEFINES", "poly.render.Renderable"),
    ("poly.render", "DEFINES", "poly.render.Color"),
    ("poly.render", "DEFINES", "poly.render.Disk"),
    ("poly.render", "DEFINES", "poly.render.BigDisk"),
    ("poly.render.Renderable", "DEFINES_METHOD", "poly.render.Renderable.render"),
    ("poly.render.Disk", "DEFINES_METHOD", "poly.render.Disk.render"),
    ("poly.render.BigDisk", "DEFINES_METHOD", "poly.render.BigDisk.render"),
    ("poly.render.BigDisk", "DEFINES_METHOD", "poly.render.BigDisk.draw"),
    ("poly.render.Disk", "IMPLEMENTS", "poly.render.Renderable"),
    ("poly.render.BigDisk", "INHERITS", "poly.render.Disk"),
    # overrides through interface and superclass
    ("poly.render.Disk.render", "OVERRIDES", "poly.render.Renderable.render"),
    ("poly.render.BigDisk.render", "OVERRIDES", "poly.render.Disk.render"),
    # super() dispatch → nearest base method; self-call → own method
    ("poly.render.BigDisk.render", "CALLS", "poly.render.Disk.render"),
    ("poly.render.BigDisk.draw", "CALLS", "poly.render.BigDisk.render"),
    # __all__ exports
    ("poly.pub", "DEFINES", "poly.pub.visible"),
    ("poly.pub", "DEFINES", "poly.pub.hidden"),
    ("poly.pub", "EXPORTS", "poly.pub.visible"),
    # dependency manifest
    ("poly", "DEPENDS_ON_EXTERNAL", "numpy"),
    ("poly", "DEPENDS_ON_EXTERNAL", "requests"),
    # --- media attribution (poly/media.py) ---
    ("poly.media", "DEFINES", "poly.media.render_doc"),
    # --- MRO sibling shadow (poly/mixin.py) ---
    ("poly.mixin", "DEFINES", "poly.mixin.Combinable"),
    ("poly.mixin", "DEFINES", "poly.mixin.SearchMixin"),
    ("poly.mixin", "DEFINES", "poly.mixin.Search"),
    ("poly.mixin.Combinable", "DEFINES_METHOD", "poly.mixin.Combinable.combine"),
    ("poly.mixin.SearchMixin", "DEFINES_METHOD", "poly.mixin.SearchMixin.combine"),
    ("poly.mixin.Search", "INHERITS", "poly.mixin.SearchMixin"),
    ("poly.mixin.Search", "INHERITS", "poly.mixin.Combinable"),
    # the mixin shadows the sibling branch's same-name method in Search's MRO
    ("poly.mixin.SearchMixin.combine", "OVERRIDES", "poly.mixin.Combinable.combine"),
    # --- type inference corpus (poly/typing.py) ---
    ("poly.typing", "IMPORTS", "poly.shapes"),
    ("poly.typing", "DEFINES", "poly.typing.make"),
    ("poly.typing", "DEFINES", "poly.typing.use_local"),
    ("poly.typing", "DEFINES", "poly.typing.use_returned"),
    ("poly.typing", "DEFINES", "poly.typing.use_chained"),
    ("poly.typing", "DEFINES", "poly.typing.use_param"),
    ("poly.typing", "DEFINES", "poly.typing.rebound"),
    ("poly.typing", "DEFINES", "poly.typing.use_untyped"),
    ("poly.typing", "DEFINES", "poly.typing.recurse"),
    ("poly.typing.make", "INSTANTIATES", "poly.shapes.Circle"),
    ("poly.typing.use_local", "INSTANTIATES", "poly.shapes.Circle"),
    ("poly.typing.use_chained", "INSTANTIATES", "poly.shapes.Circle"),
    ("poly.typing.rebound", "INSTANTIATES", "poly.shapes.Circle"),
    # v = Circle(); v.area() → Circle.area (local var type inference)
    ("poly.typing.use_local", "CALLS", "poly.shapes.Circle.area"),
    # typed receiver method provided by an ancestor (Shape.ident)
    ("poly.typing.use_local", "CALLS", "poly.shapes.Shape.ident"),
    # m = make(); m.area() → return-type inference through make
    ("poly.typing.use_returned", "CALLS", "poly.typing.make"),
    ("poly.typing.use_returned", "CALLS", "poly.shapes.Circle.area"),
    # chained make().area() / Circle().area()
    ("poly.typing.use_chained", "CALLS", "poly.typing.make"),
    ("poly.typing.use_chained", "CALLS", "poly.shapes.Circle.area"),
    # annotated parameter: def use_param(s: Shape)
    ("poly.typing.use_param", "CALLS", "poly.shapes.Shape.area"),
    # direct recursion IS an edge (reference
    # tests/test_nested_local_function_calls.py:50-60)
    ("poly.typing.recurse", "CALLS", "poly.typing.recurse"),
}

# triples our engine must NOT emit (suppression / precision checks)
POLYGLOT_FORBIDDEN = {
    ("poly.ext.fetch", "CALLS", "poly.ext.get"),
    ("poly.nested.outer", "CALLS", "poly.nested.helper"),
    ("poly.nested.top", "CALLS", "poly.nested.outer.helper"),
    # super() must skip the own class; self-call must prefer the own class
    ("poly.render.BigDisk.render", "CALLS", "poly.render.BigDisk.render"),
    ("poly.render.BigDisk.draw", "CALLS", "poly.render.Disk.render"),
    # non-__all__ symbols are not exported
    ("poly.pub", "EXPORTS", "poly.pub.hidden"),
    # rebinding a typed var to a non-ctor drops the type — no edge
    ("poly.typing.rebound", "CALLS", "poly.shapes.Circle.area"),
    # a dotted callee on an unknown receiver NEVER falls back to a
    # simple-name match (the reference's chained-call drop rule)
    ("poly.typing.use_untyped", "CALLS", "poly.ext.get"),
    # typed rungs must prefer the receiver class over its ancestor
    ("poly.typing.use_local", "CALLS", "poly.shapes.Shape.area"),
    ("poly.typing.use_returned", "CALLS", "poly.shapes.Shape.area"),
    # MRO shadow must point mixin → sibling, never reversed
    ("poly.mixin.Combinable.combine", "OVERRIDES", "poly.mixin.SearchMixin.combine"),
}


def documents_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, schema=DOCUMENTS_SCHEMA)


def slice0(spark: SparkSession) -> DataFrame:
    return documents_df(spark, SLICE0_DOCS)


def polyglot(spark: SparkSession) -> DataFrame:
    return documents_df(spark, POLYGLOT_DOCS)


# ---------------------------------------------------------------------------
# Synthetic scale corpus: deterministic generator for bench / scaling runs.
# Shape matches input_hint; content exercises every ladder rung.
# ---------------------------------------------------------------------------


def _synth_module_doc(
    i: int, n_docs: int, funcs_per_doc: int, pkg_fanout: int
) -> dict:
    p = i % pkg_fanout
    sib1 = (i + 1) % n_docs
    sib2 = (i + 7) % n_docs
    name = f"mod{i:05d}"
    imports = (
        f"from synth.pkg{sib1 % pkg_fanout:03d}.mod{sib1:05d} import fn_0\n"
        f"import synth.pkg{sib2 % pkg_fanout:03d}.mod{sib2:05d}\n"
        "import numpy\n"
    )
    body = [
        imports,
        # inheritance + override per module: exercises the INHERITS
        # resolution and the OVERRIDES closure in every bench run
        f"class B{i % 7}:\n    def run(self):\n        return 0\n    def step(self):\n        return 1\n\n",
        f"class C{i % 97}(B{i % 7}):\n    def run(self):\n        return self.step()\n    def step(self):\n        return 1\n\n",
    ]
    for f_i in range(funcs_per_doc):
        callee = f"fn_{(f_i + 1) % funcs_per_doc}"
        body.append(
            f"def fn_{f_i}():\n"
            f"    {callee}()\n"
            f"    fn_0()\n"
            f"    numpy.zeros(3)\n"
            f"    c = C{i % 97}()\n"
            f"    return c\n\n"
        )
    spans = [code("".join(body))]
    if i % 5 == 0:
        spans.append(media(f"assets/diagram_{i}.png"))
        spans.append(code(f"def tail_{i}():\n    fn_0()\n"))
    return _doc(f"synth/pkg{p:03d}/{name}.py", *spans)


def synth_corpus_rows(
    n_docs: int, funcs_per_doc: int = 8, pkg_fanout: int = 50
) -> list[dict]:
    """Deterministic synthetic repo: ``n_docs`` modules in ``pkg_fanout``
    packages; each module defines classes + functions, imports two sibling
    modules, and calls local/imported/class functions. No RNG — content is a
    pure function of the doc index, so any two runs (and any two parallelism
    levels) see identical input."""
    rows = [_doc("synth/__init__.py", code(""))]
    for p in range(min(pkg_fanout, n_docs)):
        rows.append(_doc(f"synth/pkg{p:03d}/__init__.py", code("")))
    for i in range(n_docs):
        rows.append(_synth_module_doc(i, n_docs, funcs_per_doc, pkg_fanout))
    return rows


def synth_corpus(spark: SparkSession, n_docs: int, **kw) -> DataFrame:
    return documents_df(spark, synth_corpus_rows(n_docs, **kw))


def synth_corpus_distributed(
    spark: SparkSession,
    n_docs: int,
    funcs_per_doc: int = 8,
    pkg_fanout: int = 50,
    partitions: int | None = None,
) -> DataFrame:
    """Same content as ``synth_corpus`` but generated ON THE EXECUTORS
    (mapInPandas over ``spark.range``) — the driver never materializes the
    corpus, so scaling benches measure the engine, not corpus generation.
    Content is identical to the driver-side generator for the same params."""
    import pandas as pd

    n_parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i == 0:
                    rows.append(_doc("synth/__init__.py", code("")))
                if i < min(pkg_fanout, n_docs):
                    rows.append(_doc(f"synth/pkg{i:03d}/__init__.py", code("")))
                rows.append(
                    _synth_module_doc(i, n_docs, funcs_per_doc, pkg_fanout)
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return spark.range(0, n_docs, 1, n_parts).mapInPandas(
        gen, schema=DOCUMENTS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Snippet-retrieval corpus (kg_code_snippet driver oracle): line numbers and
# expected snippets are hand-derived from this text, so the oracle is a
# VALUES twin fully independent of the kernel's span arithmetic.
# ---------------------------------------------------------------------------

SNIPPET_DOCS = [
    _doc(
        "snip/app.py",
        code(
            "import os\n"  # 1
            "\n"  # 2
            "\n"  # 3
            "def top(a):\n"  # 4
            "    b = a + 1\n"  # 5
            "    return b\n"  # 6
            "\n"  # 7
            "\n"  # 8
            "class Box:\n"  # 9
            "    def get(self):\n"  # 10
            "        return self.v\n"  # 11
            "\n"  # 12
            "    def put(self, v):\n"  # 13
            "        self.v = v\n"  # 14
        ),
    ),
    _doc(
        "snip/util.py",
        code(
            "def helper(x):\n"  # 1
            "    return x * 2\n"  # 2
        ),
    ),
]

# qualified names the driver query retrieves
SNIPPET_QNS = (
    "snip.app.Box",
    "snip.app.Box.get",
    "snip.app.top",
    "snip.util.helper",
)

# (label, qualified_name, path, start_line, end_line, source_code) —
# start/end are the kernel's spans (end extends through trailing blank
# lines); source_code is the reference slice ``all_lines[start-1:end]``
# (code_retrieval.py:104) clamped to the file and right-stripped.
SNIPPET_EXPECTED = [
    (
        "Class",
        "snip.app.Box",
        "snip/app.py",
        9,
        15,
        "class Box:\n    def get(self):\n        return self.v\n\n"
        "    def put(self, v):\n        self.v = v",
    ),
    (
        "Method",
        "snip.app.Box.get",
        "snip/app.py",
        10,
        12,
        "    def get(self):\n        return self.v",
    ),
    (
        "Function",
        "snip.app.top",
        "snip/app.py",
        4,
        8,
        "def top(a):\n    b = a + 1\n    return b",
    ),
    (
        "Function",
        "snip.util.helper",
        "snip/util.py",
        1,
        3,
        "def helper(x):\n    return x * 2",
    ),
]
