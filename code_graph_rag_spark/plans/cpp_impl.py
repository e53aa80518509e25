"""Deferred C++ out-of-class method binding, as joins.

The reference defers ``Ret Cls::name(...)`` definitions until every class
is registered, then binds each to its class wherever it lives
(``graph_updater.py:661-667`` resolve_deferred_cpp_methods,
``definition_processor.py`` deferred method machinery). Here the kernel
emits a ``method_impl`` mention for an out-of-class definition whose
class is NOT in the same file, with a PROVISIONAL qn
``<impl_module>.<Cls>.<name>``; this pass — run after module
disambiguation, before entity minting — resolves the class through a
three-rung ladder and rewrites the provisional qns in place:

1. same-module class (post-disambiguation);
2. class inside an ``#include``-imported module (includes resolved with
   the shared import ladder, including the collision-suffixed form
   ``a.shapes.h``);
3. globally unique class name (the registry simple-name gate).

A resolved impl yields a ``method`` def mention under the resolved class
UNLESS the class already declares a same-named method (the header
declaration IS the entity — re-minting would fork a collision variant);
either way every body mention's ``parent_qn`` rewrites to the resolved
method qn, so calls inside out-of-class bodies attribute correctly.
Unresolved impls emit nothing (the reference's no-guessing rule) and
their provisional-parent body calls phantom-drop downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.plans.resolution import resolve_import_targets


def bind_method_impls(mentions: DataFrame) -> DataFrame:
    """mentions (post-disambiguation) → mentions with method_impl rows
    resolved into method defs + rewritten body attributions."""
    impls = mentions.filter(F.col("kind") == "method_impl")
    if impls.isEmpty():
        return mentions

    classes = mentions.filter(
        F.col("kind").isin("class", "interface", "enum")
    ).select(
        F.col("qn").alias("cls_qn"),
        F.col("name").alias("cls_name"),
        F.col("module_qn").alias("cls_mqn"),
    )
    imp = impls.select(
        F.concat_ws("#", "doc_id", "qn").alias("impl_id"),
        "doc_id",
        "module_qn",
        F.col("qn").alias("old_qn"),
        "name",
        F.col("local_name").alias("cls_ref"),
        "start_line",
        "end_line",
        "start_col",
        F.split(F.col("module_qn"), "\\.").getItem(0).alias("project"),
    )

    # rung 1: same-module class
    c1 = imp.join(
        classes,
        (imp["module_qn"] == classes["cls_mqn"])
        & (imp["cls_ref"] == classes["cls_name"]),
    ).select("impl_id", "cls_qn", F.lit(1).alias("priority"))

    # rung 2: class inside an include-imported module — includes of the
    # impl's DOC resolved against the module table (same ladder the alias
    # frame uses, incl. the collision-suffixed `a.shapes.h` form)
    modules = mentions.filter(F.col("kind") == "module").select(
        F.col("qn").alias("qualified_name")
    )
    incs = mentions.filter(F.col("kind") == "import").select(
        "doc_id",
        F.col("target").alias("ref"),
        F.split(F.col("module_qn"), "\\.").getItem(0).alias("project"),
    )
    incs = incs.join(
        imp.select("doc_id").distinct(), "doc_id", "left_semi"
    ).filter(~F.col("ref").startswith("external::"))
    resolved_incs = resolve_import_targets(
        incs.select("project", "ref").distinct(), modules
    )
    doc_incs = incs.join(resolved_incs, ["project", "ref"]).select(
        "doc_id", F.col("resolved_mqn").alias("inc_mqn")
    )
    c2 = (
        imp.join(doc_incs, "doc_id")
        .join(
            classes,
            (F.col("inc_mqn") == classes["cls_mqn"])
            & (imp["cls_ref"] == classes["cls_name"]),
        )
        .select("impl_id", "cls_qn", F.lit(2).alias("priority"))
    )

    # rung 3: globally unique class name
    uniq = (
        classes.groupBy("cls_name")
        .agg(
            F.countDistinct("cls_qn").alias("n"),
            F.min("cls_qn").alias("cls_qn"),
        )
        .filter(F.col("n") == 1)
        .select("cls_name", "cls_qn")
    )
    c3 = imp.join(uniq, imp["cls_ref"] == uniq["cls_name"]).select(
        "impl_id", "cls_qn", F.lit(3).alias("priority")
    )

    w = Window.partitionBy("impl_id").orderBy("priority", "cls_qn")
    winner = (
        c1.unionByName(c2)
        .unionByName(c3)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("impl_id", "cls_qn")
    )
    bound = imp.join(winner, "impl_id").select(
        "doc_id",
        "module_qn",
        "old_qn",
        "name",
        "start_line",
        "end_line",
        "start_col",
        "cls_qn",
        F.concat_ws(".", "cls_qn", "name").alias("new_qn"),
    )
    bound = bound.localCheckpoint(eager=True)  # consumed three ways below

    # def mentions for impls whose class does NOT already declare the
    # method (a header declaration IS the entity; re-minting would fork a
    # collision variant)
    declared = mentions.filter(F.col("kind") == "method").select(
        F.col("qn").alias("new_qn")
    )
    new_defs = bound.join(declared, "new_qn", "left_anti").select(
        "doc_id",
        "module_qn",
        F.lit("method").alias("kind"),
        F.col("new_qn").alias("qn"),
        "name",
        F.col("cls_qn").alias("parent_qn"),
        F.lit("Class").alias("parent_kind"),
        "start_line",
        "end_line",
        "start_col",
    )

    # rewrite body attributions (calls/returns emitted under the
    # provisional qn) and drop the impl markers
    remap = bound.select(
        F.col("old_qn").alias("parent_qn"),
        F.col("new_qn").alias("remapped_qn"),
    ).dropDuplicates(["parent_qn"])
    out = (
        mentions.filter(F.col("kind") != "method_impl")
        .join(remap, "parent_qn", "left")  # no forced broadcast:
        # one row per out-of-class method — corpus-scaling for C++ repos;
        # AQE broadcasts while small
        .withColumn(
            "parent_qn", F.coalesce("remapped_qn", "parent_qn")
        )
        .drop("remapped_qn")
    )
    # class-context hints inside out-of-class bodies carry the
    # PROVISIONAL class prefix (`<impl_module>.<Cls>.<meth>`) — rewrite
    # the prefix to the resolved class (equi-join on the hint's class
    # part, i.e. the hint minus its last segment)
    cls_remap = bound.select(
        F.expr(
            "substring(old_qn, 1, length(old_qn) - instr(reverse(old_qn), '.'))"
        ).alias("hint_cls"),
        F.col("cls_qn").alias("new_cls"),
    ).dropDuplicates(["hint_cls"])
    hint_cls = F.expr(
        "substring(class_ctx_hint, 1,"
        " length(class_ctx_hint) - instr(reverse(class_ctx_hint), '.'))"
    )
    out = (
        out.withColumn(
            "_hint_cls",
            F.when(F.col("class_ctx_hint").isNotNull(), hint_cls),
        )
        .join(
            cls_remap,
            F.col("_hint_cls") == cls_remap["hint_cls"],
            "left",
        )
        .withColumn(
            "class_ctx_hint",
            F.when(
                F.col("new_cls").isNotNull(),
                F.concat(
                    F.col("new_cls"),
                    F.expr(
                        "substring(class_ctx_hint,"
                        " length(_hint_cls) + 1)"
                    ),
                ),
            ).otherwise(F.col("class_ctx_hint")),
        )
        .drop("_hint_cls", "hint_cls", "new_cls")
    )
    return out.unionByName(new_defs, allowMissingColumns=True)
