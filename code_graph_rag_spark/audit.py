"""Structural graph audit — the reference's ``graph_audit.py`` invariants
as DataFrame checks, run after every fixture build (its conftest runs the
audit on every test graph, ``tests/conftest.py:279-305``).

Checks:
* no dangling edges (both endpoints exist) — ``graph_audit.py:102-131``;
* unique key per (label, id) — ``constants/graph.py:112-137`` constraints;
* no orphan nodes except Project (every non-Project node has ≥1 edge) —
  ``cypher_queries.py:7-10`` analogue;
* edge types restricted to the documented schema triples.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class AuditReport:
    dangling_edges: int = 0
    duplicate_keys: int = 0
    orphan_nodes: list[str] = field(default_factory=list)
    unknown_preds: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return (
            self.dangling_edges == 0
            and self.duplicate_keys == 0
            and not self.orphan_nodes
            and not self.unknown_preds
        )


KNOWN_PREDS = {
    "CONTAINS_PACKAGE",
    "CONTAINS_FOLDER",
    "CONTAINS_FILE",
    "CONTAINS_MODULE",
    "DEFINES",
    "DEFINES_METHOD",
    "IMPORTS",
    "EXPORTS",
    "EXPORTS_MODULE",
    "DEPENDS_ON_EXTERNAL",
    "INHERITS",
    "IMPLEMENTS",
    "IMPLEMENTS_MODULE",
    "OVERRIDES",
    "CALLS",
    "REFERENCES",
    "INSTANTIATES",
    "READS_FROM",
    "WRITES_TO",
    "FLOWS_TO",
    "EXPOSES",
    "RESOLVES_TO",
    "HAS_MEDIA",
}


def audit(nodes: DataFrame, edges: DataFrame) -> AuditReport:
    ids = nodes.select(F.col("id").alias("nid")).distinct().persist()
    dangling = (
        edges.join(ids, edges["subj"] == F.col("nid"), "left_anti").count()
        + edges.join(ids, edges["obj"] == F.col("nid"), "left_anti").count()
    )
    dups = (
        nodes.groupBy("label", "id").count().filter(F.col("count") > 1).count()
    )
    touched = (
        edges.select(F.col("subj").alias("nid"))
        .unionByName(edges.select(F.col("obj").alias("nid")))
        .distinct()
    )
    orphans = [
        r.id
        for r in nodes.filter(F.col("label") != "Project")
        .join(touched, nodes["id"] == touched["nid"], "left_anti")
        .select("id")
        .collect()
    ]
    unknown = [
        r.pred
        for r in edges.select("pred").distinct().collect()
        if r.pred not in KNOWN_PREDS
    ]
    ids.unpersist()
    return AuditReport(
        dangling_edges=dangling,
        duplicate_keys=dups,
        orphan_nodes=sorted(orphans),
        unknown_preds=sorted(unknown),
    )
