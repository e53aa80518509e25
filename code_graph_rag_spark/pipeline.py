"""End-to-end KG construction: documents → nodes / edges / adjacency.

The reference's ``GraphUpdater.run`` (``codebase_rag/graph_updater.py:604-796``)
is a sequence of imperative passes over shared in-memory registries. Here the
same lifecycle is one declarative lineage:

    documents ─ repartitionByRange(doc_id) ─ mapInPandas(extract)
      → mentions (persisted: shared by every downstream branch, the analogue
        of the reference's combined-query capture cache)
      → entities (variant minting window)            [SURVEY §2.7]
      → structure pass (pure DataFrame)              [SURVEY §2.1]
      → alias frame + IMPORTS (verification joins)   [SURVEY §2.4]
      → call ladder joins → CALLS/INSTANTIATES/REFERENCES
      → INHERITS (+base_index) → OVERRIDES BFS
      → union → capture-group filter → dedup → phantom-drop → tables
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.extract.mentions import extract_mentions
from code_graph_rag_spark.plans.inherits import (
    ancestor_closure,
    ext_nodes_from_edges,
    override_edges,
    resolve_inherits,
)
from code_graph_rag_spark.plans.resolution import (
    build_alias_frame,
    call_edges,
    resolve_calls,
)
from code_graph_rag_spark.plans.structure import module_containment, structure_pass
from code_graph_rag_spark.plans.triples import (
    adjacency,
    dedup_edges,
    drop_phantoms,
    union_edges,
)
from code_graph_rag_spark.plans.variants import mint_entities
from code_graph_rag_spark.schema import DEFAULT_GROUPS, enabled_rels


@dataclass
class GraphResult:
    nodes: DataFrame
    edges: DataFrame
    mentions: DataFrame
    entities: DataFrame
    # every internally persisted frame — unpersisting ALL of them matters
    # for long sessions (leaked caches measured a 1.75x slowdown on the
    # second build in one session)
    persisted: list = None

    def adjacency(self) -> DataFrame:
        return adjacency(self.edges)

    def unpersist(self) -> None:
        for df in (
            self.mentions,
            self.entities,
            self.nodes,
            self.edges,
            *(self.persisted or []),
        ):
            try:
                df.unpersist()
            except Exception:
                pass


def disambiguate_modules(mentions: DataFrame) -> DataFrame:
    """Cross-language basename collisions: the first file (sorted doc order)
    keeps the plain module QN; later files get ``qn.<ext>`` appended, and all
    of that document's derived QNs are rewritten under the new prefix
    (reference ``definition_processor.py:260-269`` + deterministic winner =
    sorted file order, ``graph_updater.py:1614-1617``)."""
    mods = mentions.filter(F.col("kind") == "module").select("doc_id", "module_qn")
    w = Window.partitionBy("module_qn").orderBy("doc_id")
    ext = F.regexp_extract(F.col("doc_id"), r"\.([A-Za-z0-9_]+)$", 1)
    mapping = (
        mods.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select(
            "doc_id",
            "module_qn",
            F.concat_ws(".", F.col("module_qn"), ext).alias("new_mqn"),
        )
    )
    m = mentions.join(F.broadcast(mapping), ["doc_id", "module_qn"], "left")

    def rewrite(c: str) -> F.Column:
        col = F.col(c)
        prefix_hit = col.isNotNull() & (
            (col == F.col("module_qn"))
            | col.startswith(F.concat(F.col("module_qn"), F.lit(".")))
        )
        rewritten = F.concat(
            F.col("new_mqn"),
            F.expr(f"substring({c}, length(module_qn) + 1)"),
        )
        return F.when(
            F.col("new_mqn").isNotNull() & prefix_hit, rewritten
        ).otherwise(col)

    for c in ("qn", "parent_qn", "enclosing_hint", "class_ctx_hint"):
        m = m.withColumn(c, rewrite(c))
    m = m.withColumn(
        "module_qn", F.coalesce(F.col("new_mqn"), F.col("module_qn"))
    ).drop("new_mqn")
    return m


_NODE_COLS = ["label", "id", "name", "path", "start_line", "end_line", "props"]


def _pad_nodes(df: DataFrame) -> DataFrame:
    for c, t in (
        ("name", "string"),
        ("path", "string"),
        ("start_line", "int"),
        ("end_line", "int"),
        ("props", "string"),
    ):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast(t))
    return df.select(*_NODE_COLS)


def _materialize(df: DataFrame, tag: str = "") -> DataFrame:
    """Stage boundary: materialize + truncate lineage.

    Each fan-out frame (mentions, entities, alias, inherits) is consumed by
    several downstream branches; ``localCheckpoint`` (a) computes it once —
    the reference's shared capture cache, ``definition_processor.py:357-371``
    — and (b) cuts the logical plan, which keeps Catalyst optimization time
    bounded as the join DAG deepens (measured: an uncut slice-0 plan cost
    ~50 s of driver-side optimization for <1 s of execution). On a cluster
    this is the per-stage checkpoint of the north rule; swapping in a
    reliable checkpoint dir / parquet stage table is a one-liner."""
    t0 = time.time()
    out = df.localCheckpoint(eager=True)
    if os.environ.get("CGR_DEBUG_TIMING"):
        print(f"[cgr-timing] {tag or 'stage'}: {time.time() - t0:.1f}s", flush=True)
    return out


def build_graph(
    documents: DataFrame,
    groups: tuple[str, ...] = DEFAULT_GROUPS,
    partitions: int | None = None,
) -> GraphResult:
    return build_graph_from_mentions(extract_mentions(documents, partitions), groups)


def build_graph_from_mentions(
    raw_mentions: DataFrame,
    groups: tuple[str, ...] = DEFAULT_GROUPS,
) -> GraphResult:
    """Disambiguation + resolution + assembly over an existing (raw,
    pre-disambiguation) mentions frame.

    Split out so the incremental path (``incremental.py``) can splice
    re-extracted mentions for changed docs into the persisted mention table
    and rerun only the join phase — extraction (the dominant cost at scale)
    is never repeated for unchanged documents, and incremental ≡ full
    rebuild holds by construction (same mentions → same graph).
    Disambiguation runs here because it is cross-document (collision window
    over all module QNs).
    """
    mentions = _materialize(disambiguate_modules(raw_mentions), "mentions")
    documents = mentions.select("doc_id").distinct()
    entities = _materialize(mint_entities(mentions), "entities")
    modules = entities.filter(F.col("label") == "Module").select(
        "qualified_name", "doc_id", "qn"
    )

    # ---- structure layer (pure DataFrame, no UDF) ----
    struct_nodes, struct_edges = structure_pass(documents)
    mod_edges = module_containment(
        mentions.filter(F.col("kind") == "module").select("qn", "doc_id"),
        struct_nodes,
    )

    # ---- entity nodes + containment (DEFINES / DEFINES_METHOD) ----
    entity_nodes = entities.select(
        "label",
        F.col("qualified_name").alias("id"),
        "name",
        F.col("doc_id").alias("path"),
        "start_line",
        "end_line",
        "props",
    )
    defines = entities.filter(F.col("parent_qn").isNotNull()).select(
        F.col("parent_qn").alias("subj"),
        F.when(
            (F.col("parent_kind") == "Class") & (F.col("label") == "Method"),
            F.lit("DEFINES_METHOD"),
        )
        .otherwise(F.lit("DEFINES"))
        .alias("pred"),
        F.col("qualified_name").alias("obj"),
        F.col("parent_kind").alias("subj_label"),
        F.col("label").alias("obj_label"),
    )

    # ---- imports / alias dictionary ----
    registry: list = []
    alias, import_edges, ext_imp_nodes = build_alias_frame(
        mentions, modules, persist_registry=registry
    )
    alias = _materialize(alias, "alias")  # consumed by calls + inherits branches

    # ---- type edges first: the ancestor closure feeds the super()/
    # inherited-self rungs of call resolution ----
    inh_e = _materialize(
        resolve_inherits(mentions, entities, alias, persist_registry=registry),
        "inherits",
    )
    closure = ancestor_closure(inh_e)
    ovr_e = override_edges(entities, inh_e, closure)

    # ---- calls / refs ----
    resolved = resolve_calls(
        mentions, entities, alias, closure, persist_registry=registry
    )
    call_e = call_edges(resolved, entities)

    # ---- exports: __all__ symbols → Module EXPORTS Class/Function ----
    exports = (
        mentions.filter(F.col("kind") == "export")
        .select(
            F.col("module_qn").alias("subj"),
            F.concat_ws(".", "module_qn", "name").alias("target"),
        )
        .join(
            entities.filter(F.col("label").isin("Class", "Function")).select(
                F.col("qn").alias("target"),
                F.col("qualified_name").alias("obj"),
                F.col("label").alias("obj_label"),
            ),
            "target",
        )
        .select(
            "subj",
            F.lit("EXPORTS").alias("pred"),
            "obj",
            F.lit("Module").alias("subj_label"),
            "obj_label",
        )
    )

    # ---- dependency manifests → Project DEPENDS_ON_EXTERNAL ----
    deps = mentions.filter(F.col("kind") == "dependency").select(
        F.col("parent_qn").alias("subj"),
        F.lit("DEPENDS_ON_EXTERNAL").alias("pred"),
        F.col("name").alias("obj"),
        F.lit("Project").alias("subj_label"),
        F.lit("ExternalPackage").alias("obj_label"),
    )
    ext_pkg_nodes = deps.select(
        F.lit("ExternalPackage").alias("label"),
        F.col("obj").alias("id"),
        F.col("obj").alias("name"),
        F.lit(None).cast("string").alias("path"),
    ).distinct()

    # ---- assembly ----
    ext_nodes = ext_imp_nodes.unionByName(ext_nodes_from_edges(inh_e)).distinct()
    nodes = (
        _pad_nodes(struct_nodes)
        .unionByName(_pad_nodes(entity_nodes))
        .unionByName(_pad_nodes(ext_nodes))
        .unionByName(_pad_nodes(ext_pkg_nodes))
        .dropDuplicates(["label", "id"])
    )
    # nodes/edges trees are shallow once the fan-out frames above are
    # checkpointed → plain lazy persist (no extra materialization pass);
    # Catalyst cost stays bounded and the first caller action computes once.
    nodes = nodes.persist()
    edges = union_edges(
        struct_edges,
        mod_edges,
        defines,
        import_edges,
        call_e,
        inh_e,
        ovr_e,
        exports,
        deps,
    )
    edges = edges.filter(F.col("pred").isin(*sorted(enabled_rels(groups))))
    edges = drop_phantoms(dedup_edges(edges), nodes).persist()
    return GraphResult(
        nodes=nodes,
        edges=edges,
        mentions=mentions,
        entities=entities,
        persisted=registry,
    )
