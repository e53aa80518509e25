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


def dead_code(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Unreachable Function/Method nodes.

    Roots (dead_code.py:65-200 root selection, mapped to our schema):
    module top-level code (Module nodes — module-level calls originate
    there), dunder-named and decorated definitions, test-path symbols,
    entry-point ``main`` functions, and exported symbols (``__all__`` —
    a public API is alive even without an internal caller).
    """
    dunder = F.col("name").rlike(r"^__.*__$")
    decorated = F.col("props").isNotNull() & F.col("props").contains(
        '"decorators"'
    )
    test_path = F.coalesce(F.col("path"), F.lit("")).rlike(r"(^|/)tests?(/|_)")
    entry_point = (F.col("label") == "Function") & (F.col("name") == "main")
    roots = nodes.filter(
        (F.col("label") == "Module")
        | dunder
        | decorated
        | test_path
        | entry_point
    ).select("id")
    exported = edges.filter(F.col("pred") == "EXPORTS").select(
        F.col("obj").alias("id")
    )
    roots = roots.unionByName(exported).distinct()
    alive = reachable(edges, roots)
    return (
        nodes.filter(F.col("label").isin("Function", "Method"))
        .join(alive, nodes["id"] == alive["id"], "left_anti")
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
