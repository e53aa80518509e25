"""Final assembly: nodes table, edges table, phantom-drop, adjacency lists.

Phantom-edge suppression: the reference relies on the graph DB silently
dropping MERGEs against nonexistent endpoints (``import_processor.py:865-869``,
audited by ``graph_audit.py:102-131``). We reproduce that exactly with an
inner join of the triple frame against the node table on BOTH endpoints —
dangling triples can never reach storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from code_graph_rag_spark.schema import MERGE_KEY_PROPS_BY_REL


def _ensure_props(edges: DataFrame) -> DataFrame:
    if "props" not in edges.columns:
        edges = edges.withColumn(
            "props", F.lit(None).cast("map<string,string>")
        )
    if "src_doc" not in edges.columns:
        edges = edges.withColumn("src_doc", F.lit(None).cast("string"))
    return edges


def union_edges(*frames: DataFrame) -> DataFrame:
    out = None
    for f in frames:
        f = _ensure_props(f).select(
            "subj", "pred", "obj", "subj_label", "obj_label", "props", "src_doc"
        )
        out = f if out is None else out.unionByName(f)
    return out


def dedup_edges(edges: DataFrame, by_src: bool = False) -> DataFrame:
    """(subj,pred,obj) dedup, except rel types whose identity includes
    provenance props (MERGE_KEY_PROPS_BY_REL, constants/graph.py:470-472).

    ``by_src=True`` keeps one row per (edge, src_doc) — the provenance table
    the incremental path deletes/inserts by doc."""
    edges = _ensure_props(edges)
    extra = sorted({p for ps in MERGE_KEY_PROPS_BY_REL.values() for p in ps})
    key = [
        F.col("subj"),
        F.col("pred"),
        F.col("obj"),
        *([F.col("src_doc")] if by_src and "src_doc" in edges.columns else []),
        *[
            F.when(
                F.col("pred").isin(*MERGE_KEY_PROPS_BY_REL.keys()),
                F.col("props").getItem(p),
            ).alias(f"_k_{p}")
            for p in extra
        ],
    ]
    return edges.withColumn("_key", F.struct(*key)).dropDuplicates(["_key"]).drop("_key")


def drop_phantoms(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Inner-join both endpoints against the node id set.

    No broadcast hint: the node table grows with the corpus (10^12-doc
    regime), so the semi-joins must be shuffle joins; AQE converts them to
    broadcast at runtime when the id set is actually small."""
    ids = nodes.select(F.col("id").alias("_nid")).distinct()
    return (
        edges.join(ids, edges["subj"] == F.col("_nid"), "left_semi")
        .join(ids, edges["obj"] == F.col("_nid"), "left_semi")
    )


def adjacency(edges: DataFrame, max_neighbors: int | None = None) -> DataFrame:
    """Materialized adjacency lists per (node, direction, rel type) — the
    Spark analogue of the reference's protobuf ID adjacency lists
    (``codec/schema.proto:36-60``) and the JSON loader's in/out indexes
    (``graph_loader.py:48-146``).

    ``max_neighbors``: bound each list to the first N neighbors (sorted) and
    add ``n_neighbors`` with the TRUE degree. At corpus scale a hub entity
    (millions of callers) must never become one unbounded row — the cap is
    applied with a per-group row_number BEFORE collect_list, so the shuffle
    never carries an uncapped list."""
    from pyspark.sql import Window

    pairs = edges.select(
        F.col("subj").alias("node"), "pred", F.lit("out").alias("direction"),
        F.col("obj").alias("nb"),
    ).unionByName(
        edges.select(
            F.col("obj").alias("node"), "pred", F.lit("in").alias("direction"),
            F.col("subj").alias("nb"),
        )
    )
    if max_neighbors is None:
        return (
            pairs.groupBy("node", "pred", "direction")
            .agg(F.sort_array(F.collect_list("nb")).alias("neighbors"))
        )
    grp = Window.partitionBy("node", "pred", "direction")
    ranked = pairs.withColumn(
        "rn", F.row_number().over(grp.orderBy("nb"))
    ).withColumn("n_neighbors", F.count("*").over(grp))
    return (
        ranked.filter(F.col("rn") <= max_neighbors)
        .groupBy("node", "pred", "direction", "n_neighbors")
        .agg(F.sort_array(F.collect_list("nb")).alias("neighbors"))
        .select("node", "pred", "direction", "neighbors", "n_neighbors")
    )
