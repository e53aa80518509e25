"""Cypher-subset read path (code_graph_rag_spark/cypher.py).

Hand-built graph frames (no pipeline build — the compiler is graph-agnostic)
with expected results derived by hand; mirrors the reference's read-query
shapes from cypher_queries.py (audit rel-triples, decorated-function lookup,
variable-length containment walks, grouped counts)."""

from __future__ import annotations

import pytest

from code_graph_rag_spark.cypher import CypherError, run_cypher

NODES = [
    # label, id, name, path, start_line, end_line
    ("Module", "app.main", "main", "app/main.py", 1, 50),
    ("Module", "app.util", "util", "app/util.py", 1, 30),
    ("Class", "app.main.Svc", "Svc", "app/main.py", 3, 20),
    ("Class", "app.util.Base", "Base", "app/util.py", 2, 10),
    ("Class", "app.util.Mid", "Mid", "app/util.py", 12, 20),
    ("Function", "app.main.run", "run", "app/main.py", 22, 30),
    ("Function", "app.util.helper", "helper", "app/util.py", 22, 28),
    ("Method", "app.main.Svc.go", "go", "app/main.py", 5, 9),
]

EDGES = [
    # subj, pred, obj, subj_label, obj_label
    ("app.main", "DEFINES", "app.main.Svc", "Module", "Class"),
    ("app.main", "DEFINES", "app.main.run", "Module", "Function"),
    ("app.util", "DEFINES", "app.util.Base", "Module", "Class"),
    ("app.util", "DEFINES", "app.util.Mid", "Module", "Class"),
    ("app.util", "DEFINES", "app.util.helper", "Module", "Function"),
    ("app.main.Svc", "DEFINES_METHOD", "app.main.Svc.go", "Class", "Method"),
    ("app.main.Svc", "INHERITS", "app.util.Mid", "Class", "Class"),
    ("app.util.Mid", "INHERITS", "app.util.Base", "Class", "Class"),
    ("app.main.run", "CALLS", "app.main.Svc.go", "Function", "Method"),
    ("app.main.Svc.go", "CALLS", "app.util.helper", "Method", "Function"),
]


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        NODES, "label string, id string, name string, path string, "
        "start_line int, end_line int"
    )
    edges = spark.createDataFrame(
        EDGES, "subj string, pred string, obj string, subj_label string, "
        "obj_label string"
    )
    return nodes, edges


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_audit_rel_triples(graph):
    # cypher_queries.py CYPHER_AUDIT_REL_TRIPLES
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (a)-[r]->(b) "
        "RETURN DISTINCT labels(a)[0] AS src, type(r) AS rel, "
        "labels(b)[0] AS dst ORDER BY src, rel, dst",
    )
    assert out.columns == ["src", "rel", "dst"]
    assert ("Class", "INHERITS", "Class") in _rows(out)
    assert ("Function", "CALLS", "Method") in _rows(out)
    assert len(_rows(out)) == 6


def test_point_lookup_with_props(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (a)-[:CALLS]->(b {qualified_name: 'app.util.helper'}) "
        "RETURN a.qualified_name AS caller ORDER BY caller",
    )
    assert _rows(out) == [("app.main.Svc.go",)]


def test_label_alternation_and_where(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n:Function|Method) WHERE n.path STARTS WITH 'app/main' "
        "AND n.start_line > 1 "
        "RETURN n.name AS name ORDER BY name",
    )
    assert _rows(out) == [("go",), ("run",)]


def test_varlen_closure(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (c:Class)-[:INHERITS*]->(b:Class) "
        "RETURN c.qualified_name AS cls, b.qualified_name AS anc "
        "ORDER BY cls, anc",
    )
    assert _rows(out) == [
        ("app.main.Svc", "app.util.Base"),
        ("app.main.Svc", "app.util.Mid"),
        ("app.util.Mid", "app.util.Base"),
    ]


def test_grouped_count(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module)-[:DEFINES]->(f) "
        "RETURN m.qualified_name AS module, count(f) AS n "
        "ORDER BY n DESC, module",
    )
    assert _rows(out) == [("app.util", 3), ("app.main", 2)]


def test_global_count_and_in(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n) WHERE n.name IN ['run', 'go', 'helper'] "
        "RETURN count(*) AS n",
    )
    assert _rows(out) == [(3,)]


def test_reversed_arrow_and_limit(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (b)<-[:DEFINES]-(m:Module) "
        "RETURN b.qualified_name AS qn ORDER BY qn LIMIT 2",
    )
    assert _rows(out) == [("app.main.Svc",), ("app.main.run",)]


def test_multi_hop_chain(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module)-[:DEFINES]->(c:Class)"
        "-[:DEFINES_METHOD]->(x:Method) "
        "RETURN m.name AS module, c.name AS cls, x.name AS method",
    )
    assert _rows(out) == [("main", "Svc", "go")]


def test_or_not_null_contains(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n:Class) WHERE (n.name = 'Base' OR n.name CONTAINS 'id') "
        "AND n.path IS NOT NULL AND NOT n.name = 'Svc' "
        "RETURN n.name AS name ORDER BY name",
    )
    assert _rows(out) == [("Base",), ("Mid",)]


def test_comma_cross_product(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module), (f:Function) "
        "RETURN count(*) AS n",
    )
    assert _rows(out) == [(4,)]  # 2 modules x 2 functions


def test_orphan_audit_pattern_predicate(graph):
    # CYPHER_AUDIT_ORPHANS shape: every node in this graph has an edge
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n) WHERE NOT (n)--() AND NOT n:Project "
        "RETURN labels(n)[0] AS label, count(n) AS orphans",
    )
    assert _rows(out) == []


def test_leaf_functions_typed_pattern(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n:Function|Method) WHERE NOT (n)-[:CALLS]->() "
        "RETURN n.name AS name ORDER BY name",
    )
    assert _rows(out) == [("helper",)]


def test_no_incoming_direction(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n:Module) WHERE NOT (n)<--() "
        "RETURN n.name AS name ORDER BY name",
    )
    assert _rows(out) == [("main",), ("util",)]


def test_positive_pattern_and_label_predicate(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n) WHERE n:Class AND (n)-[:INHERITS]->() "
        "RETURN n.name AS name ORDER BY name",
    )
    assert _rows(out) == [("Mid",), ("Svc",)]


def test_errors(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher(nodes, edges, "MATCH (a)-[:X]->(a) RETURN a")
    with pytest.raises(CypherError):
        run_cypher(nodes, edges, "CREATE (a) RETURN a")
    with pytest.raises(CypherError):
        run_cypher(nodes, edges, "MATCH (a) RETURN a.no_such_prop")


# --- v1.1 extensions: OPTIONAL MATCH, WITH pipelines, UNWIND, toLower ----


def test_optional_match_nulls_and_matches(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module) OPTIONAL MATCH (m)-[:DEFINES]->(f:Method) "
        "RETURN m.name AS mod, f.name AS meth ORDER BY mod",
    )
    assert _rows(out) == [("main", None), ("util", None)]
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module) WHERE m.name = 'util' "
        "OPTIONAL MATCH (m)-[:DEFINES]->(c:Class) "
        "RETURN m.name AS mod, c.name AS cls ORDER BY cls",
    )
    assert _rows(out) == [("util", "Base"), ("util", "Mid")]


def test_chained_optional_match_propagates_nulls(graph):
    # the reference's project-structure shape (cypher_queries.py:31-33):
    # a second OPTIONAL MATCH anchored on the first one's variable
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module {qualified_name: 'app.main'}) "
        "OPTIONAL MATCH (m)-[:DEFINES*]->(d) "
        "OPTIONAL MATCH (d)-[:DEFINES_METHOD]->(meth) "
        "RETURN m.name AS mod, d.name AS d, meth.name AS meth ORDER BY d",
    )
    rows = _rows(out)
    assert ("main", "Svc", "go") in rows
    assert ("main", "run", None) in rows


def test_optional_is_null_filter(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module) OPTIONAL MATCH (m)-[:DEFINES]->(f:Method) "
        "WHERE f IS NULL RETURN m.name AS mod ORDER BY mod",
    )
    assert _rows(out) == [("main",), ("util",)]


def test_with_aggregate_then_where(graph):
    # the reference's damaged-structure probe shape (cypher_queries.py:44-48)
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (parent)-[:DEFINES]->(n) WITH n, count(parent) AS parents "
        "WHERE parents > 1 RETURN 1 AS damaged LIMIT 1",
    )
    assert _rows(out) == []  # no multi-parent in the fixture
    out = run_cypher(
        nodes, edges,
        "MATCH (m)-[:DEFINES]->(n) WITH m, count(n) AS defs "
        "WHERE defs > 2 RETURN m.name AS name, defs",
    )
    assert _rows(out) == [("util", 3)]


def test_return_aggregates_over_with_alias(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (m:Module)-[:DEFINES]->(n) WITH m, count(n) AS defs "
        "RETURN count(m) AS mods, count(DISTINCT defs) AS distinct_defs",
    )
    assert _rows(out) == [(2, 2)]


def test_with_distinct_passthrough(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (a)-[:DEFINES]->(n) WITH DISTINCT a "
        "RETURN count(a) AS n_definers",
    )
    assert _rows(out) == [(2,)]


def test_unwind_labels_distinct(graph):
    # CYPHER_AUDIT_LABELS (cypher_queries.py:11)
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (n) UNWIND labels(n) AS label "
        "RETURN DISTINCT label ORDER BY label",
    )
    assert [r[0] for r in _rows(out)] == [
        "Class", "Function", "Method", "Module",
    ]


def test_tolower(graph):
    nodes, edges = graph
    out = run_cypher(
        nodes, edges,
        "MATCH (c:Class) WHERE toLower(c.name) = 'svc' "
        "RETURN toLower(c.qualified_name) AS qn",
    )
    assert _rows(out) == [("app.main.svc",)]


def test_optional_must_anchor_on_bound_var(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher(
            nodes, edges,
            "MATCH (m:Module) OPTIONAL MATCH (x:Class)-[:INHERITS]->(y) "
            "RETURN m.name AS mod",
        )


def test_numeric_aggregates_in_return(graph):
    nodes, edges = graph
    out = _rows(
        run_cypher(
            nodes,
            edges,
            "MATCH (m:Module)-[:DEFINES]->(x) "
            "RETURN min(m.qualified_name) AS lo, max(m.qualified_name) AS hi, "
            "count(*) AS n",
        )
    )
    assert out == [("app.main", "app.util", 5)]


def test_sum_min_max_avg_over_with_stage(graph):
    # aggregate-of-aggregate: per-module fan-out, then corpus stats
    nodes, edges = graph
    out = _rows(
        run_cypher(
            nodes,
            edges,
            "MATCH (m:Module)-[:DEFINES]->(x) WITH m, count(x) AS n "
            "RETURN min(n) AS mn, max(n) AS mx, sum(n) AS total, "
            "avg(n) AS mean, count(*) AS mods",
        )
    )
    # app.main defines 2, app.util defines 3
    assert out == [(2, 3, 5, 2.5, 2)]


def test_sum_distinct_and_line_numbers(graph):
    nodes, edges = graph
    out = _rows(
        run_cypher(
            nodes,
            edges,
            "MATCH (c:Class) RETURN sum(DISTINCT c.start_line) AS s, "
            "max(c.end_line) AS e",
        )
    )
    # class start lines: 3, 2, 12 (distinct) → 17; max end 20
    assert out == [(17, 20)]


def test_avg_distinct_rejected(graph):
    nodes, edges = graph
    with pytest.raises(CypherError):
        run_cypher(
            nodes, edges, "MATCH (c:Class) RETURN avg(DISTINCT c.start_line) AS a"
        )
