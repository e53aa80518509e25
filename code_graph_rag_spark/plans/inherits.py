"""Type edges: INHERITS with base order, OVERRIDES via iterative BFS joins.

Reference: generic INHERITS/IMPLEMENTS resolution once the full registry is
known (``graph_updater.py:739-744``, ``class_ingest/mixin.py:481-551``);
method-override pass walks the inheritance DAG nearest-ancestor-first
(``class_ingest/method_override.py:18-67,306-360``). Here the DAG walk is a
bounded driver-side loop of frontier joins with lineage cuts
(``localCheckpoint``) — the standard Spark shape for iterative graph
algorithms (SURVEY.md §4 custom-work item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.plans.resolution import (
    P_IMPORT,
    P_SAME_MODULE,
    P_SIMPLE_NAME,
)


def resolve_inherits(
    mentions: DataFrame, entities: DataFrame, alias: DataFrame
) -> DataFrame:
    """inherit mentions → INHERITS edges (props: base_index).

    Base names resolve through the import-alias → same-module → unique
    simple-name ladder; a base bound to an external import yields INHERITS to
    an ExternalModule id (graph-schema: INHERITS targets include
    ExternalModule). Unresolvable bases emit nothing
    (``class_ingest/mixin.py:481-551``: no guessing).
    """
    inh = mentions.filter(F.col("kind") == "inherit").select(
        F.concat_ws("#", "doc_id", "qn", "base_index").alias("mention_id"),
        F.col("qn").alias("subj"),
        "module_qn",
        F.col("callee").alias("base"),
        "base_index",
        F.split(F.col("callee"), "\\.").getItem(0).alias("first_seg"),
        F.when(
            F.instr(F.col("callee"), ".") > 0,
            F.expr("substring(callee, instr(callee, '.') + 1)"),
        ).alias("rest"),
    )
    balias = F.broadcast(
        alias.select(
            F.col("module_qn").alias("a_mqn"),
            F.col("local_name").alias("a_local"),
            "full_qn",
            "is_external",
        )
    )
    key = ["mention_id", "subj", "base", "base_index"]

    alias_hits = inh.join(
        balias,
        (inh["module_qn"] == F.col("a_mqn")) & (inh["first_seg"] == F.col("a_local")),
    )
    c_imp = alias_hits.filter(~F.col("is_external")).select(
        *key,
        F.when(F.col("rest").isNotNull(), F.concat_ws(".", "full_qn", "rest"))
        .otherwise(F.col("full_qn"))
        .alias("cand_qn"),
        F.lit(P_IMPORT).alias("priority"),
    )
    # external base: edge straight to the ExternalModule id (as-written
    # full alias path)
    ext_edges = alias_hits.filter(F.col("is_external")).select(
        "subj",
        F.lit("INHERITS").alias("pred"),
        F.when(F.col("rest").isNotNull(), F.concat_ws(".", "full_qn", "rest"))
        .otherwise(F.col("full_qn"))
        .alias("obj"),
        F.lit("Class").alias("subj_label"),
        F.lit("ExternalModule").alias("obj_label"),
        F.col("base_index"),
    )
    c_same = inh.select(
        *key,
        F.concat_ws(".", "module_qn", "base").alias("cand_qn"),
        F.lit(P_SAME_MODULE).alias("priority"),
    )

    classes = entities.filter(
        F.col("label").isin("Class", "Interface", "Enum")
    ).select(
        F.col("qn").alias("e_qn"),
        F.col("qualified_name").alias("target_variant"),
        F.col("name").alias("e_name"),
        F.col("label").alias("target_label"),
    )
    exact = (
        c_imp.unionByName(c_same)
        .join(classes, F.col("cand_qn") == classes["e_qn"])
        .select(*key, "priority", "target_variant", "target_label")
    )
    bare = inh.filter(F.col("rest").isNull())
    simple = (
        bare.join(classes, bare["base"] == classes["e_name"])
        .withColumn("n", F.count("*").over(Window.partitionBy("mention_id")))
        .filter(F.col("n") == 1)
        .select(*key, F.lit(P_SIMPLE_NAME).alias("priority"), "target_variant", "target_label")
    )

    hits = exact.unionByName(simple).filter(F.col("subj") != F.col("target_variant"))
    w = Window.partitionBy("mention_id").orderBy("priority", "target_variant")
    internal = (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "subj",
            F.lit("INHERITS").alias("pred"),
            F.col("target_variant").alias("obj"),
            F.lit("Class").alias("subj_label"),
            F.col("target_label").alias("obj_label"),
            "base_index",
        )
    )
    out = internal.unionByName(ext_edges)
    return out.withColumn(
        "props",
        F.create_map(F.lit("base_index"), F.col("base_index").cast("string")),
    ).drop("base_index")


def ext_nodes_from_edges(edges: DataFrame) -> DataFrame:
    """ExternalModule nodes for edges pointing outside the repo."""
    return (
        edges.filter(F.col("obj_label") == "ExternalModule")
        .select(
            F.lit("ExternalModule").alias("label"),
            F.col("obj").alias("id"),
            F.element_at(F.split("obj", "\\."), -1).alias("name"),
            F.lit(None).cast("string").alias("path"),
        )
        .distinct()
    )


def override_edges(
    entities: DataFrame, inherits: DataFrame, max_depth: int = 16
) -> DataFrame:
    """Method OVERRIDES via nearest-ancestor BFS over the INHERITS frame.

    For each (class, method-name), find the closest ancestor class defining
    the same method name; emit ``method OVERRIDES ancestor_method``
    (``class_ingest/method_override.py:306-360``: superclass chain walked
    nearest-first; ties broken by base order). Driver-side bounded loop;
    each frontier is localCheckpoint'ed to cut lineage.
    """
    methods = entities.filter(F.col("label") == "Method").select(
        F.col("parent_qn").alias("cls"),
        F.col("name").alias("mname"),
        F.col("qualified_name").alias("mqn"),
    )
    parents = (
        inherits.filter(F.col("obj_label").isin("Class", "Interface", "Enum"))
        .select(
            F.col("subj").alias("cls"),
            F.col("obj").alias("anc"),
            F.coalesce(
                F.col("props").getItem("base_index").cast("int"), F.lit(0)
            ).alias("ord"),
        )
        .distinct()
    )
    if parents.isEmpty():
        return methods.sparkSession.createDataFrame(
            [],
            "subj string, pred string, obj string, subj_label string, obj_label string",
        )

    results = []
    frontier = parents.withColumn("depth", F.lit(1)).localCheckpoint(eager=True)
    resolved_pairs = None  # (cls, mname) already matched at a closer depth
    for _ in range(max_depth):
        # methods provided by the frontier's ancestors
        hit = (
            methods.alias("m")
            .join(frontier.alias("f"), F.col("m.cls") == F.col("f.cls"))
            .join(
                methods.alias("a"),
                (F.col("f.anc") == F.col("a.cls"))
                & (F.col("m.mname") == F.col("a.mname")),
            )
            .select(
                F.col("m.cls").alias("cls"),
                F.col("m.mname").alias("mname"),
                F.col("m.mqn").alias("subj"),
                F.col("a.mqn").alias("obj"),
                F.col("f.ord").alias("ord"),
            )
        )
        if resolved_pairs is not None:
            hit = hit.join(resolved_pairs, ["cls", "mname"], "left_anti")
        w = Window.partitionBy("cls", "mname", "subj").orderBy("ord", "obj")
        hit = (
            hit.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .drop("rk", "ord")
            .localCheckpoint(eager=True)
        )
        if not hit.isEmpty():
            results.append(hit)
            newly = hit.select("cls", "mname").distinct()
            resolved_pairs = (
                newly
                if resolved_pairs is None
                else resolved_pairs.unionByName(newly).distinct()
            ).localCheckpoint(eager=True)
        # expand frontier one hop: cls → anc-of-anc
        frontier = (
            frontier.alias("f")
            .join(
                parents.alias("p"),
                F.col("f.anc") == F.col("p.cls"),
            )
            .select(
                F.col("f.cls").alias("cls"),
                F.col("p.anc").alias("anc"),
                F.col("f.ord").alias("ord"),
                (F.col("f.depth") + 1).alias("depth"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        if frontier.isEmpty():
            break

    if not results:
        return methods.sparkSession.createDataFrame(
            [],
            "subj string, pred string, obj string, subj_label string, obj_label string",
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "subj",
        F.lit("OVERRIDES").alias("pred"),
        "obj",
        F.lit("Method").alias("subj_label"),
        F.lit("Method").alias("obj_label"),
    ).dropDuplicates(["subj", "pred", "obj"])
