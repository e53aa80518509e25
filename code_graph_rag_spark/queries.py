"""Read-path analytics over the materialized graph (SURVEY §2.13).

The reference moved dead-code reachability OUT of the graph DB into a
client-side multi-source BFS (``dead_code.py:1-7``) because per-root Cypher
BFS was O(roots×graph). The Spark form is the same algorithm as distributed
frontier joins over the edge frame — linear in edges per round, bounded by
graph diameter, lineage cut each round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reachability expands over these edge types (dead_code.py roots/edges)
REACH_PREDS = ("CALLS", "REFERENCES", "INSTANTIATES", "INHERITS")


def reachable(
    edges: DataFrame, roots: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Multi-source BFS: all nodes reachable from ``roots(id)`` over
    REACH_PREDS (+ OVERRIDES revival: reaching a method revives the methods
    it overrides and vice versa — ``dead_code.py`` OVERRIDES expansion)."""
    adj = (
        edges.filter(F.col("pred").isin(*REACH_PREDS))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    ovr = edges.filter(F.col("pred") == "OVERRIDES")
    adj = (
        adj.unionByName(ovr.select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
        .unionByName(ovr.select(F.col("obj").alias("src"), F.col("subj").alias("dst")))
        .distinct()
        .persist()
    )
    visited = roots.select(F.col("id")).distinct().localCheckpoint(eager=True)
    frontier = visited
    for _ in range(max_iter):
        nxt = (
            adj.join(frontier, adj["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    adj.unpersist()
    return visited


# decorators whose presence roots a definition (the runtime/framework
# invokes it with no visible call site) — the reference's default list,
# constants/deadcode_roots.py:20-57 DEFAULT_ROOT_DECORATORS
ROOT_DECORATORS = (
    "route", "get", "post", "callback", "put", "delete", "patch",
    "websocket", "task", "flow", "fixture", "command", "cli", "app",
    "on_event", "listener", "validator", "field_validator",
    "model_validator", "root_validator", "field_serializer",
    "model_serializer", "computed_field", "abstractmethod", "property",
    "cached_property", "classproperty", "hybrid_property", "setter",
    "deleter",
)
# matches a decorator whose normalized head (last dotted segment before
# the argument list) is one of the root names, inside the props JSON:
# `"@app.get('/x')"` / `"@property"` — the name must be followed by `(`
# or the closing quote, so `@get_config` never matches `get`
_ROOT_DEC_RE = r'(?i)["@.](' + "|".join(ROOT_DECORATORS) + r')[("\\]'
_TEST_PATH_RE = r"(^|/)tests?(/|_)|_test\.\w+$"


def dead_code(
    nodes: DataFrame, edges: DataFrame, include_tests: bool = False
) -> DataFrame:
    """Unreachable Function/Method nodes.

    Root selection mirrors the reference (``dead_code.py:470-620``):

    * module top-level code — Module nodes as BFS sources is exactly the
      reference's "targets of Module-origin CALLS/REFERENCES/INSTANTIATES
      edges" rule, since those edges are the only reach-predicates leaving
      a Module;
    * definitions carrying a ROOT decorator (the reference's
      ``DEFAULT_ROOT_DECORATORS`` — NOT every decorated symbol);
    * dunder METHODS in Python files (runtime-invoked by name);
    * Go ``main``/``init`` and Rust ``main`` runtime entry functions
      (``GO_ROOT_FUNCTION_NAMES``/``RUST_ROOT_FUNCTION_NAMES``, gated by
      extension — a Python ``main`` is only alive if something calls it);
    * exported symbols (``__all__`` / Go capitalized: a public API is
      alive without an internal caller).

    Test symbols follow the reference's polarity: with
    ``include_tests=False`` they are EXCLUDED from the report (test
    helpers are infrastructure, not dead production code) and are not
    roots — production code called only from tests stays reportable.
    """
    path = F.coalesce(F.col("path"), F.lit(""))
    test_path = path.rlike(_TEST_PATH_RE)
    root_decorated = F.coalesce(F.col("props"), F.lit("")).rlike(_ROOT_DEC_RE)
    dunder_method = (
        (F.col("label") == "Method")
        & F.col("name").rlike(r"^__.*__$")
        & path.endswith(".py")
    )
    entry_point = (F.col("label") == "Function") & (
        (F.col("name").isin("main", "init") & path.endswith(".go"))
        | ((F.col("name") == "main") & path.endswith(".rs"))
    )
    root_filter = (
        (F.col("label") == "Module")
        | root_decorated
        | dunder_method
        | entry_point
    )
    if not include_tests:
        root_filter = root_filter & ~test_path
    roots = nodes.filter(root_filter).select("id")
    exported = edges.filter(F.col("pred") == "EXPORTS").select(
        F.col("obj").alias("id")
    )
    roots = roots.unionByName(exported).distinct()
    alive = reachable(edges, roots)
    report = nodes.filter(F.col("label").isin("Function", "Method"))
    if not include_tests:
        report = report.filter(~test_path)
    return (
        report.join(alive, report["id"] == alive["id"], "left_anti")
        .select("label", "id", "name", "path")
        .orderBy("id")
    )


def find_with_prefix(nodes: DataFrame, prefix: str) -> DataFrame:
    """Prefix subtree search — the trie ``find_with_prefix`` read path
    (reference ``function_registry.py:281-283``) as a prefix predicate.

    On a parquet/Iceberg node table sorted (or bucketed) by id this compiles
    to a range scan: ``id >= prefix AND id < prefix + chr(0x10FFFF)`` with
    both bounds pushed into the scan."""
    hi = prefix + "\U0010ffff"
    return (
        nodes.filter((F.col("id") >= prefix) & (F.col("id") < hi))
        .select("label", "id", "name")
        .orderBy("id")
    )


def code_snippets(
    nodes: DataFrame, documents: DataFrame, qualified_names: tuple[str, ...]
) -> DataFrame:
    """Code retrieval by qualified name — the reference's core GraphRAG
    read (``tools/code_retrieval.py:40-112`` find_code_snippet): look up
    the definition node, then return ``all_lines[start_line-1:end_line]``
    (code_retrieval.py:104) of the owning document's code text, clamped to
    the file and right-stripped (kernel end_line extends through trailing
    blank lines).

    Scale shape: the literal IN over the node table is a range/point scan
    on an id-sorted or bucketed table; the tiny hit set then semi-joins the
    document scan (broadcast), and only matched documents pay the text
    reassembly — no corpus shuffle anywhere. The span-concat ``transform``
    is one interpreted HOF per MATCHED DOCUMENT (point-lookup cold path,
    not per-token — the CLAUDE.md ban targets hot paths)."""
    hits = nodes.filter(
        F.col("id").isin(*qualified_names) & F.col("start_line").isNotNull()
    ).select(
        "label",
        F.col("id").alias("qualified_name"),
        "path",
        "start_line",
        "end_line",
    )
    hit_docs = documents.join(
        F.broadcast(hits.select(F.col("path").alias("doc_id")).distinct()),
        "doc_id",
        "left_semi",
    )
    # spans arrive offset-sorted per the source contract (schema.py); code
    # spans concatenate to the same text the kernels numbered lines over
    text = hit_docs.select(
        F.col("doc_id").alias("path"),
        F.split(
            F.expr(
                "concat_ws('', transform("
                "filter(spans, s -> s.kind = 'code'), s -> s.text))"
            ),
            "\n",
        ).alias("lines"),
    )
    width = (
        F.least(F.col("end_line"), F.size("lines"))
        - F.col("start_line")
        + F.lit(1)
    )
    snippet = F.regexp_replace(
        F.concat_ws("\n", F.slice("lines", F.col("start_line"), width)),
        r"\s+$",
        "",
    )
    return (
        F.broadcast(hits)
        .join(text, "path")
        .select(
            "label",
            "qualified_name",
            "path",
            "start_line",
            "end_line",
            snippet.alias("source_code"),
        )
        .orderBy("qualified_name")
    )


def resolution_stats(mentions: DataFrame, resolved: DataFrame) -> DataFrame:
    """Unresolved-mention observability (round-1 verdict: silent drops are
    an unflagged recall gap). Per mention kind: total mentions entering the
    ladder, how many resolved, how many were dropped by every rung."""
    total = (
        mentions.filter(F.col("kind").isin("call", "ref"))
        .withColumn(
            "mention_id",
            F.concat_ws(
                "#", "doc_id", "start_line", "start_col", "callee", "kind"
            ),
        )
        .groupBy("kind")
        .agg(F.countDistinct("mention_id").alias("n_mentions"))
    )
    done = resolved.groupBy("kind").agg(
        F.countDistinct("mention_id").alias("n_resolved")
    )
    return (
        total.join(done, "kind", "left")
        .select(
            "kind",
            "n_mentions",
            F.coalesce("n_resolved", F.lit(0)).alias("n_resolved"),
            (
                F.col("n_mentions") - F.coalesce("n_resolved", F.lit(0))
            ).alias("n_unresolved"),
        )
        .orderBy("kind")
    )
