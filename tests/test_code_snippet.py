"""Code retrieval by qualified name (reference tools/code_retrieval.py
find_code_snippet): node lookup → line-slice of the owning document,
all_lines[start-1:end] clamped + right-stripped. Expectations are the
hand-derived fixtures.SNIPPET_EXPECTED rows (independent of the kernel)."""

from code_graph_rag_spark.fixtures import (
    SNIPPET_DOCS,
    SNIPPET_EXPECTED,
    SNIPPET_QNS,
)
from code_graph_rag_spark.pipeline import build_graph
from code_graph_rag_spark.queries import code_snippets
from code_graph_rag_spark.schema import DOCUMENTS_SCHEMA


def test_code_snippets(spark):
    docs = spark.createDataFrame(SNIPPET_DOCS, schema=DOCUMENTS_SCHEMA)
    g = build_graph(docs)
    try:
        got = [tuple(r) for r in code_snippets(g.nodes, docs, SNIPPET_QNS).collect()]
        assert got == SNIPPET_EXPECTED
        # a miss (unknown QN) returns no row rather than erroring
        none = code_snippets(g.nodes, docs, ("snip.app.nope",)).collect()
        assert none == []
    finally:
        g.unpersist()
