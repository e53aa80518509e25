"""Pass 1: filesystem-structure nodes and containment edges, pure DataFrame.

The reference walks the tree imperatively (``structure_processor.py:61-165``);
here the whole pass is derived from ``doc_id`` paths with explode/distinct —
no UDF, fully pushdown-friendly, and embarrassingly parallel at any scale.

Rules mirrored:
* root path segment = Project (``graph_updater.py:604-632``);
* a directory containing an index file (``__init__.py`` / ``mod.rs`` /
  ``index.ts``) is a Package, else a Folder
  (``structure_processor.py:61-141``);
* edges: parent dir CONTAINS_PACKAGE/CONTAINS_FOLDER child dir,
  dir CONTAINS_FILE file, dir CONTAINS_MODULE module
  (``docs/architecture/graph-schema.md`` relationship table).

Node ids: Project → name, Package → dotted qualified_name, Folder/File →
slash path (reference unique keys, ``constants/graph.py:112-137``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INDEX_FILES = ("__init__.py", "mod.rs", "index.ts")


def structure_pass(documents: DataFrame) -> tuple[DataFrame, DataFrame]:
    """documents(doc_id, ...) → (nodes, edges) for the structure layer.

    nodes: (label, id, name, path); edges: (subj, pred, obj, subj_label,
    obj_label). Module nodes/edges are added by the caller (they come from
    the mention frame, which knows index-file collapsing).
    """
    spark = documents.sparkSession
    docs = documents.select("doc_id").distinct()

    parts = F.split(F.col("doc_id"), "/")
    files = docs.select(
        F.col("doc_id").alias("path"),
        F.element_at(parts, -1).alias("name"),
        F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/").alias("dir"),
        parts.alias("parts"),
    )

    # every ancestor directory of every file, with its parent
    dirs = (
        files.select(
            F.posexplode(F.slice(F.col("parts"), 1, F.size(F.col("parts")) - 1)).alias(
                "depth", "seg"
            ),
            "parts",
        )
        .select(
            F.array_join(F.slice(F.col("parts"), 1, F.col("depth") + 1), "/").alias(
                "path"
            ),
            F.col("seg").alias("name"),
            F.when(
                F.col("depth") > 0,
                F.array_join(F.slice(F.col("parts"), 1, F.col("depth")), "/"),
            ).alias("parent"),
            F.col("depth"),
        )
        .distinct()
    )

    # package detection: directory has an index file directly inside, or
    # directly contains a .java/.cs/.go file (Java packages and C#
    # namespace dirs ARE directories, and Go's import unit is the
    # directory — reference import_processor.py:2160-2166,2612-2640,
    # parsers/go/module_paths.py: the dotted-dir Package node is what
    # class-imports / using-directives / dir-imports verify against)
    index_dirs = (
        files.filter(
            F.col("name").isin(*INDEX_FILES)
            | F.col("name").endswith(".java")
            | F.col("name").endswith(".cs")
            | F.col("name").endswith(".go")
        )
        .select(F.col("dir").alias("path"))
        .distinct()
        .withColumn("is_package", F.lit(True))
    )
    dirs = dirs.join(index_dirs, "path", "left").withColumn(
        "label",
        F.when(F.col("depth") == 0, F.lit("Project"))
        .when(F.col("is_package"), F.lit("Package"))
        .otherwise(F.lit("Folder")),
    )
    # node id: Project → name, Package → dotted path, Folder → slash path
    dirs = dirs.withColumn(
        "id",
        F.when(F.col("label") == "Project", F.col("name"))
        .when(F.col("label") == "Package", F.regexp_replace("path", "/", "."))
        .otherwise(F.col("path")),
    )

    dir_nodes = dirs.select("label", "id", "name", "path")
    file_nodes = files.select(
        F.lit("File").alias("label"),
        F.col("path").alias("id"),
        "name",
        "path",
    ).distinct()
    nodes = dir_nodes.unionByName(file_nodes)

    # containment edges between directories
    parent_ids = dirs.select(
        F.col("path").alias("parent"),
        F.col("id").alias("parent_id"),
        F.col("label").alias("parent_label"),
    )
    dir_edges = (
        dirs.filter(F.col("parent").isNotNull())
        .join(parent_ids, "parent")
        .select(
            F.col("parent_id").alias("subj"),
            F.when(F.col("label") == "Package", F.lit("CONTAINS_PACKAGE"))
            .otherwise(F.lit("CONTAINS_FOLDER"))
            .alias("pred"),
            F.col("id").alias("obj"),
            F.col("parent_label").alias("subj_label"),
            F.col("label").alias("obj_label"),
        )
    )
    file_edges = (
        files.join(parent_ids, files["dir"] == parent_ids["parent"])
        .select(
            F.col("parent_id").alias("subj"),
            F.lit("CONTAINS_FILE").alias("pred"),
            F.col("path").alias("obj"),
            F.col("parent_label").alias("subj_label"),
            F.lit("File").alias("obj_label"),
        )
    )
    edges = dir_edges.unionByName(file_edges)
    _ = spark
    return nodes, edges


def module_containment(modules: DataFrame, dir_nodes: DataFrame) -> DataFrame:
    """CONTAINS_MODULE edges: owning directory → Module.

    ``modules`` needs (qn, doc_id); the owning dir is the file's directory.
    """
    parts = F.split(F.col("doc_id"), "/")
    mods = modules.select(
        F.col("qn").alias("obj"),
        F.col("doc_id").alias("src_doc"),
        F.array_join(F.slice(parts, 1, F.size(parts) - 1), "/").alias("dir"),
    )
    owners = dir_nodes.filter(
        F.col("label").isin("Project", "Package", "Folder")
    ).select(
        F.col("path").alias("dir"),
        F.col("id").alias("subj"),
        F.col("label").alias("subj_label"),
    )
    return mods.join(owners, "dir").select(
        "subj",
        F.lit("CONTAINS_MODULE").alias("pred"),
        "obj",
        "subj_label",
        F.lit("Module").alias("obj_label"),
        "src_doc",
    )
