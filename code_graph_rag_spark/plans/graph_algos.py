"""Whole-graph analytics over the (subj, pred, obj) triple frame.

The reference ships its graph to Memgraph and answers structural questions
with Cypher over the stored graph (`cypher_queries.py:171-181` node counts,
`graph_service.py` adjacency walks). Beyond those point-lookup shapes, a
graph warehouse needs the whole-graph metrics a cluster can compute but a
single Memgraph instance cannot: degree ranking, PageRank-style centrality,
and triangle counting. These are implemented here as pure DataFrame plans
over the edge frame — no Memgraph, no driver-side graph object.

Scale notes (the 100 TB lens):

* ``degree_top``: one union + ONE hash-aggregate (single shuffle, map-side
  partial combine on the node key); top-k is ``orderBy(...).limit(k)`` which
  Spark executes as TakeOrdered (per-partition heap + driver merge of k
  rows), never a global sort.
* ``pagerank``: the link frame is deduplicated and lineage-cut ONCE; every
  power-iteration step is one equi-join (links ⋈ ranks on src) + one
  ``groupBy(dst)`` sum — the minimal shuffle structure for distributed
  PageRank. Hub destinations get map-side partial aggregation for free.
  Dangling nodes (no out-links) leak their mass, i.e. this is the
  "simplified" formulation rank(v) = (1-d)/N + d·Σ_{u→v} rank(u)/outdeg(u)
  (the same contract as GraphX's staticPageRank); the DuckDB oracle unrolls
  the identical recurrence, so the two sides verify the algorithm, not a
  replay.
* ``triangle_counts``: degree-ordered orientation — every undirected edge
  points from its lower-(degree, id) endpoint to the higher — bounds the
  wedge self-join by O(m^{3/2}) TOTAL work regardless of hub degree (Suri &
  Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
  WWW'11). Without it a single degree-D hub contributes D²/2 wedge rows;
  with it no node emits more than O(√m) wedges. Each triangle is counted
  exactly once, at its minimum-(degree, id) corner, then re-attributed to
  all three corners with one explode + aggregate.

Every iteration/fan-out frame is ``localCheckpoint``-ed per the repo rule —
uncut lineage costs seconds of Catalyst time per action at fixture scale
and compounds across power iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def degree_top(edges: DataFrame, k: int = 20) -> DataFrame:
    """Top-k nodes by total degree over the triple multiset.

    Returns (node, out_deg, in_deg, degree) — degree counts every edge
    incidence (multigraph semantics: parallel edges of different predicates
    each count). Deterministic order: degree desc, node asc.
    """
    ends = edges.select(
        F.col("subj").alias("node"), F.lit(1).alias("is_out")
    ).unionByName(edges.select(F.col("obj").alias("node"), F.lit(0).alias("is_out")))
    deg = ends.groupBy("node").agg(
        F.sum("is_out").alias("out_deg"),
        F.sum(F.lit(1) - F.col("is_out")).alias("in_deg"),
        F.count("*").alias("degree"),
    )
    return deg.orderBy(F.desc("degree"), "node").limit(k)


def _simple_links(edges: DataFrame) -> DataFrame:
    """Distinct (src, dst) link frame — simple digraph, self-loops dropped."""
    return (
        edges.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame, iters: int = 3, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over the simple digraph of the triple frame.

    rank₀(v) = 1/N;
    rankᵢ(v) = (1-d)/N + d · Σ_{u→v} rankᵢ₋₁(u) / outdeg(u).

    N is the number of distinct endpoint nodes. The node count and per-node
    out-degrees are computed declaratively (1-row aggregate cross-joined in
    — no driver action), so the whole computation is one lazy plan per
    iteration. Returns every node with round(rank, 6) — no float-ordered
    top-k, so the result is rounding-stable against the oracle.
    """
    base_links = _simple_links(edges)
    # out-degree folded into the link frame ONCE (one groupBy + one join,
    # both cut by the checkpoint) — the iteration loop then needs a single
    # equi-join per power step instead of links ⋈ ranks ⋈ outdeg (guide
    # §2.4: two operations keyed the same way share one exchange; the
    # r5 plan re-joined outdeg every iteration)
    outdeg = base_links.groupBy("src").agg(F.count("*").alias("outdeg"))
    links = base_links.join(outdeg, "src").localCheckpoint(eager=True)
    nodes = (
        links.select(F.col("src").alias("node"))
        .unionByName(links.select(F.col("dst").alias("node")))
        .unionByName(
            edges.filter(F.col("subj") == F.col("obj")).select(
                F.col("subj").alias("node")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.agg(F.count("*").alias("n_nodes"))
    # rank frame carries n_nodes along so every expression stays declarative
    ranks = nodes.crossJoin(F.broadcast(n_total)).select(
        "node", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            links.join(ranks, links.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_total))
            .join(contribs, "node", "left")
            .select(
                "node",
                "n_nodes",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            # eager=False: each iteration's frame is consumed exactly once
            # (the next iteration's join, or the final projection), so the
            # deferred final stage folds into the consumer's first job —
            # one fewer job per power iteration, identical lineage cut.
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 6).alias("pagerank")).orderBy(
        "node"
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Synchronous label propagation (community detection) over the
    undirected simple graph induced by the triple frame.

    label₀(v) = v; labelᵢ(v) = the most frequent labelᵢ₋₁ among v's
    neighbours, ties broken by lexicographically smallest label (the
    deterministic variant of Raghavan et al. 2007's LPA — synchronous
    updates + total tie order make the result a pure function of the edge
    set, so the DuckDB oracle can re-derive it independently). Nodes with
    no neighbours in the simple graph (self-loop-only nodes) keep their own
    label. Returns (node, label) for every node, ordered by node.

    Scale notes: per iteration — one equi-join (undirected links ⋈ labels
    on the neighbour key), one ``groupBy(node, label)`` count with map-side
    partial combine, and one per-node ``row_number`` window whose partition
    size is bounded by the node's *distinct neighbour-label count* (≤
    degree, shrinking every round as communities merge). No iteration ever
    materializes more than O(m) rows; each round is lineage-cut so the plan
    stays flat across iterations.
    """
    und = (
        _simple_links(edges)
        .select(
            F.col("src").alias("node"), F.col("dst").alias("nbr")
        )
        .unionByName(
            _simple_links(edges).select(
                F.col("dst").alias("node"), F.col("src").alias("nbr")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        und.select("node")
        .unionByName(
            edges.filter(F.col("subj") == F.col("obj")).select(
                F.col("subj").alias("node")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Nodes with no neighbour in the simple graph keep their own label at
    # EVERY iteration — computed once, outside the loop. Every node with a
    # neighbour gets a winner row each round (labels always covers all
    # nodes), so the per-iteration labels frame is winners ∪ isolated — the
    # r5 plan's per-iteration left-join back onto the previous labels is
    # gone (guide §2.4: remove shuffles outright).
    iso_labels = (
        nodes.join(und.select("node").distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        nbr_labels = und.join(
            labels.select(
                F.col("node").alias("nbr"), F.col("label").alias("nlabel")
            ),
            "nbr",
        ).select("node", F.col("nlabel").alias("label"))
        # winner = most frequent label, ties → lexicographically smallest:
        # min(struct(-n, label)) — a hash aggregate with map-side partial
        # combine, replacing the r5 row_number sort-window (same winner,
        # no per-node sort, one fewer execution phase per round)
        winners = (
            nbr_labels.groupBy("node", "label")
            .agg(F.count("*").alias("n"))
            .groupBy("node")
            .agg(F.min(F.struct((-F.col("n")).alias("neg_n"), "label")).alias("m"))
            .select("node", F.col("m.label").alias("label"))
        )
        # eager=False: consumed exactly once per round (next iteration's
        # neighbour join, or the final orderBy) — the deferred final stage
        # folds into that consumer's job; one fewer job per iteration.
        labels = winners.unionByName(iso_labels).localCheckpoint(eager=False)
    return labels.orderBy("node")


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over the undirected simple
    graph induced by the triple frame (direction and predicate collapsed).

    Returns (node, n_triangles) for nodes in ≥1 triangle, ordered by node.
    See the module docstring for the degree-orientation bound.
    """
    und = (
        edges.filter(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    withdeg = und.join(da, "a").join(db, "b")
    # orient low-(degree, id) → high; a < b already, so equal degrees keep a→b
    lower_is_a = F.col("deg_a") <= F.col("deg_b")
    oriented = withdeg.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=True)
    o1 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    o2 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    wedges = o1.join(o2, "x").filter(F.col("y") < F.col("z"))
    tris = wedges.join(
        und,
        (F.col("y") == F.col("a")) & (F.col("z") == F.col("b")),
        "left_semi",
    )
    corners = tris.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy("node")
    )
