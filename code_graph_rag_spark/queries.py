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

    Roots (dead_code.py root selection, simplified to our schema): module
    top-level code (Module nodes — module-level calls originate there),
    dunder-named and decorated definitions, and test-path symbols.
    """
    dunder = F.col("name").rlike(r"^__.*__$")
    decorated = F.col("props").isNotNull() & F.col("props").contains(
        '"decorators"'
    )
    test_path = F.coalesce(F.col("path"), F.lit("")).rlike(r"(^|/)tests?(/|_)")
    roots = nodes.filter(
        (F.col("label") == "Module") | dunder | decorated | test_path
    ).select("id")
    alive = reachable(edges, roots)
    return (
        nodes.filter(F.col("label").isin("Function", "Method"))
        .join(alive, nodes["id"] == alive["id"], "left_anti")
        .select("label", "id", "name", "path")
        .orderBy("id")
    )
