"""Multi-hop taint propagation: transitive closure over FLOWS_TO edges.

The reference's flow walk is intra-procedural (``parsers/flow_access/
processor.py``, one-level argument hand-off + one-level return taint, see
``plans/flow.py``). Chaining those edges across procedures — "which write
sinks can a value read from resource R ultimately reach, and through which
functions" — is left to the graph DB's variable-length path queries
(``MATCH (a)-[:FLOWS_TO*]->(b)`` over the emitted edges,
``docs/architecture/graph-schema.md:77-83``). This module is the Spark
form of that read path: a bounded-hop shortest-path closure computed as
level-synchronous frontier joins.

Semantics (pinned by the DuckDB recursive-CTE oracle, which enumerates ALL
walks up to ``max_hops`` and takes the argmin — a genuinely independent
computation):

* one row per reachable ordered pair ``(src, dst)`` with ``n_hops`` = the
  minimum number of FLOWS_TO edges on any walk;
* ``path`` = among the minimal-hop walks, the lexicographically smallest
  node sequence (compared element-wise), emitted as ``a -> b -> c``
  (stringified — the driver canonicalizer can't hash array cells);
* walks, not simple paths: no cycle guard is needed for equivalence —
  a minimal-hop walk is always simple (dropping a cycle shortens it), and
  appending the same node to two equal-length sequences preserves their
  lexicographic order, so the level-synchronous argmin-per-pair frontier
  is exactly the global argmin.

Scale: the FLOWS_TO subgraph is orders of magnitude smaller than the
corpus (only sink-tainted locals produce edges), rounds are bounded by
``max_hops``, each round is one equi-join shuffle keyed on the frontier
head plus a per-pair argmin, and lineage is cut every round
(localCheckpoint) per the repo rule. New pairs only ever shrink: the
frontier is left-anti'd against pairs already settled (first reach =
shortest), so a diameter-d graph stops after d rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def flow_closure(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Bounded transitive closure over ``FLOWS_TO`` rows of an edge frame.

    ``edges`` needs columns ``subj``/``pred``/``obj`` (a GraphResult edge
    frame); rows with ``pred != 'FLOWS_TO'`` are ignored. Returns
    ``(src, dst, n_hops, path)`` sorted-ready (caller orders).
    """
    base = (
        edges.filter(F.col("pred") == "FLOWS_TO")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )

    def best_per_pair(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("src", "dst").orderBy("path")
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    # level 1: the edges themselves; `path` is the full node sequence as an
    # array (arrays compare element-wise in both Spark and DuckDB, so the
    # argmin is engine-portable; stringified only on output)
    frontier = best_per_pair(
        base.select("src", "dst", F.array("src", "dst").alias("path"))
    ).localCheckpoint(eager=True)
    settled = frontier.withColumn("n_hops", F.lit(1)).localCheckpoint(
        eager=True
    )

    hop = 1
    while hop < max_hops and not frontier.isEmpty():
        hop += 1
        ext = (
            frontier.join(
                base.select(
                    F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
                ),
                frontier["dst"] == F.col("e_src"),
            )
            .select(
                "src",
                F.col("e_dst").alias("dst"),
                F.concat("path", F.array("e_dst")).alias("path"),
            )
        )
        # first-reach = shortest: drop pairs settled at an earlier level
        fresh = ext.join(settled.select("src", "dst"), ["src", "dst"], "left_anti")
        frontier = best_per_pair(fresh).localCheckpoint(eager=True)
        settled = settled.unionByName(
            frontier.withColumn("n_hops", F.lit(hop))
        ).localCheckpoint(eager=True)

    return settled.select(
        "src",
        "dst",
        "n_hops",
        F.array_join("path", " -> ").alias("path"),
    )


def closure_oracle_sql(edges_values: str, max_hops: int = 8) -> str:
    """DuckDB twin: enumerate every walk up to ``max_hops`` with a
    recursive CTE over the same base edges (``edges_values`` = a
    ``VALUES ...`` list of ``(src, dst)``), then argmin per pair on
    (n_hops, path-list). Independent of the Spark algorithm — it never
    prunes during the recursion."""
    return f"""
WITH RECURSIVE base(src, dst) AS (
    SELECT DISTINCT * FROM (VALUES {edges_values}) v(src, dst)
),
walk(src, dst, n_hops, path) AS (
    SELECT src, dst, 1, [src, dst] FROM base
    UNION ALL
    SELECT w.src, b.dst, w.n_hops + 1, list_append(w.path, b.dst)
    FROM walk w JOIN base b ON w.dst = b.src
    WHERE w.n_hops < {max_hops}
),
best AS (
    SELECT src, dst, n_hops, path,
           row_number() OVER (
               PARTITION BY src, dst ORDER BY n_hops, path
           ) AS rn
    FROM walk
)
SELECT src, dst, n_hops::INT AS n_hops,
       array_to_string(path, ' -> ') AS path
FROM best WHERE rn = 1
"""
