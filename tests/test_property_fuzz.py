"""Property-based robustness: the language kernels and the Cypher parser
must be total over arbitrary input — garbage in, structured rows (or a
typed CypherError) out, never a crash. No Spark needed (pure Python), so
this file belongs to the fast no-Spark set.

The reference hardens its tree-sitter tiers against malformed files the
same way (its parsers swallow syntax errors and emit what they can); our
kernels are regex/brace-scope scanners, so totality is the load-bearing
safety property — ONE raising document would fail the whole extraction
stage on a 100 TB corpus.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from code_graph_rag_spark.extract.mentions import parse_document

_EXTS = [
    "py", "js", "ts", "java", "rs", "go", "lua", "cs", "cpp", "hpp",
    "dart", "rb", "proto", "json", "yaml",
]

# text biased toward code-ish tokens so brace/paren scanners get exercised,
# plus raw unicode garbage
_CODEISH = st.text(
    alphabet=st.sampled_from(
        list("abcdefXYZ_0189 \t\n(){}[]<>:;,.*&|=+-/'\"\\#@!%`~$^?")
    ),
    max_size=400,
)
_ANY_TEXT = st.one_of(_CODEISH, st.text(max_size=200))

# the mention IR has two row shapes: definition-ish rows carry a qualified
# name and a full span; call/ref rows carry the callee and a point span
# (the join phase attaches the rest) — see extract/mentions.py
_REQUIRED_DEF = {"kind", "qn", "name", "start_line", "end_line", "start_col"}
_REQUIRED_CALL = {"kind", "callee", "start_line", "start_col"}


@settings(max_examples=60, deadline=None)
@given(ext=st.sampled_from(_EXTS), text=_ANY_TEXT)
def test_kernels_total_and_well_formed(ext, text):
    rows = parse_document(f"fuzz/pkg/mod.{ext}", text)
    assert isinstance(rows, list)
    n_lines = max(1, text.count("\n") + 1)
    for r in rows:
        assert isinstance(r["kind"], str) and r["kind"]
        required = (
            _REQUIRED_CALL if r["kind"] in ("call", "ref") else _REQUIRED_DEF
        )
        assert required <= set(r), r
        # spans stay inside the document and are ordered
        sl, el = r.get("start_line"), r.get("end_line")
        if sl is not None:
            assert 1 <= sl <= n_lines + 1, r
        if sl is not None and el is not None:
            assert sl <= el <= n_lines + 1, r


@settings(max_examples=60, deadline=None)
@given(text=_ANY_TEXT)
def test_kernels_deterministic(text):
    a = parse_document("fuzz/d.py", text)
    b = parse_document("fuzz/d.py", text)
    assert a == b


@settings(max_examples=80, deadline=None)
@given(
    q=st.one_of(
        st.text(max_size=120),
        st.sampled_from(
            [
                "MATCH (n RETURN n",
                "MATCH (a)-[:X]->(b) RETURN",
                "MATCH (a) WHERE RETURN a",
                "RETURN count(",
                "MATCH (a) RETURN a ORDER LIMIT 3",
                "MATCH (a:L {p: }) RETURN a",
                "UNWIND labels(n) AS RETURN n",
            ]
        ),
    )
)
def test_cypher_parser_total(q):
    """Arbitrary input either parses or raises the typed CypherError —
    never an unhandled exception (the NL→Cypher layer upstream can emit
    anything)."""
    from code_graph_rag_spark.cypher import CypherError, _Parser, _tokenize

    try:
        _Parser(_tokenize(q)).parse()
    except CypherError:
        pass


def test_manifest_fuzz_smoke():
    """Manifest parsers over truncated/garbled manifests stay total."""
    from code_graph_rag_spark.extract.mentions import parse_document as pd

    garbled = [
        ("a/package.json", '{"dependencies": {"x": '),
        ("a/go.mod", "module \nrequire (\n\tx"),
        ("a/Cargo.toml", "[dependencies\nserde = { ver"),
        ("a/Gemfile", "gem 'x', '~>"),
        ("a/composer.json", "not json at all"),
        ("a/pubspec.yaml", "dependencies:\n  - ["),
        ("a/app.csproj", "<Project><ItemGroup><PackageReference"),
    ]
    for doc_id, text in garbled:
        rows = pd(doc_id, text)
        assert isinstance(rows, list)
