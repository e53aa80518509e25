"""Type edges: INHERITS/IMPLEMENTS with base order, ancestor closure,
OVERRIDES via the closure.

Reference: generic INHERITS/IMPLEMENTS resolution once the full registry is
known (``graph_updater.py:739-744``, ``class_ingest/mixin.py:481-551``);
method-override pass walks the inheritance DAG nearest-ancestor-first
(``class_ingest/method_override.py:18-67,306-360``). Instead of an adaptive
per-depth loop, we materialize the **bounded ancestor closure by doubling**
(3 doublings → depth ≤ 8, beyond any real class hierarchy): O(log depth)
checkpointed joins, reused by OVERRIDES, ``super()`` dispatch and inherited
self-method resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.plans.resolution import (
    P_IMPORT,
    P_SAME_MODULE,
    P_SIMPLE_NAME,
)

_CLASSY = ("Class", "Interface", "Enum")


def resolve_inherits(
    mentions: DataFrame,
    entities: DataFrame,
    alias: DataFrame,
    persist_registry: list | None = None,
) -> DataFrame:
    """inherit mentions → INHERITS / IMPLEMENTS edges (props: base_index).

    Base names resolve through the import-alias → same-module → unique
    simple-name ladder; a base that is an Interface yields IMPLEMENTS
    (graph-schema relationship table); a base bound to an external import
    yields INHERITS to an ExternalModule id. Unresolvable bases emit nothing
    (``class_ingest/mixin.py:481-551``: no guessing).
    """
    inh = mentions.filter(F.col("kind") == "inherit").select(
        F.concat_ws("#", "doc_id", "qn", "base_index").alias("mention_id"),
        F.col("qn").alias("subj"),
        "doc_id",
        "module_qn",
        F.col("callee").alias("base"),
        "base_index",
        F.split(F.col("callee"), "\\.").getItem(0).alias("first_seg"),
        F.when(
            F.instr(F.col("callee"), ".") > 0,
            F.expr("substring(callee, instr(callee, '.') + 1)"),
        ).alias("rest"),
    )
    # alias frame scales with the corpus — AQE decides broadcast at runtime
    balias = alias.select(
        F.col("module_qn").alias("a_mqn"),
        F.col("local_name").alias("a_local"),
        "full_qn",
        "is_external",
    )
    key = ["mention_id", "subj", "doc_id", "base", "base_index"]

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
        F.col("doc_id").alias("src_doc"),
    )
    c_same = inh.select(
        *key,
        F.concat_ws(".", "module_qn", "base").alias("cand_qn"),
        F.lit(P_SAME_MODULE).alias("priority"),
    )

    classes = entities.filter(F.col("label").isin(*_CLASSY)).select(
        F.col("qn").alias("e_qn"),
        F.col("qualified_name").alias("target_variant"),
        F.col("name").alias("e_name"),
        F.col("label").alias("target_label"),
    )
    # no broadcast hint (scales with class count); AQE decides at runtime
    subj_labels = entities.filter(F.col("label").isin(*_CLASSY)).select(
        F.col("qn").alias("subj"), F.col("label").alias("s_label")
    ).dropDuplicates(["subj"])

    exact = (
        c_imp.unionByName(c_same)
        .join(classes, F.col("cand_qn") == classes["e_qn"])
        .select(*key, "priority", "target_variant", "target_label")
        .persist()  # reused: union into hits + gates the fallback rung
    )
    if persist_registry is not None:
        persist_registry.append(exact)
    # unique-simple-name fallback only for bases no earlier rung answered
    # (hub class names would otherwise explode the name join — same gating
    # as the call ladder's last-resort rung)
    answered = exact.select("mention_id").distinct()
    bare = inh.filter(F.col("rest").isNull()).join(
        answered, "mention_id", "left_anti"
    )
    simple = (
        bare.join(classes, bare["base"] == classes["e_name"])
        .withColumn("n", F.count("*").over(Window.partitionBy("mention_id")))
        .filter(F.col("n") == 1)
        .select(
            *key,
            F.lit(P_SIMPLE_NAME).alias("priority"),
            "target_variant",
            "target_label",
        )
    )

    hits = exact.unionByName(simple).filter(F.col("subj") != F.col("target_variant"))
    w = Window.partitionBy("mention_id").orderBy("priority", "target_variant")
    internal = (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(subj_labels, "subj", "left")
        .select(
            "subj",
            F.when(F.col("target_label") == "Interface", F.lit("IMPLEMENTS"))
            .otherwise(F.lit("INHERITS"))
            .alias("pred"),
            F.col("target_variant").alias("obj"),
            F.coalesce(F.col("s_label"), F.lit("Class")).alias("subj_label"),
            F.col("target_label").alias("obj_label"),
            "base_index",
            F.col("doc_id").alias("src_doc"),
        )
    )
    out = internal.unionByName(
        ext_edges.join(subj_labels, "subj", "left")
        .select(
            "subj",
            "pred",
            "obj",
            F.coalesce(F.col("s_label"), F.lit("Class")).alias("subj_label"),
            "obj_label",
            "base_index",
            "src_doc",
        )
    )
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


def ancestor_closure(inherits: DataFrame, doublings: int = 3) -> DataFrame:
    """Bounded transitive closure of the inheritance DAG by doubling.

    Returns (cls, anc, depth, ord): every internal ancestor up to depth
    2^doublings, with ``ord`` = base_index of the first hop (ties in the
    nearest-provider pick break by declared base order — first-match-wins,
    ``method_override.py:306-360``). Each doubling is localCheckpoint'ed.
    """
    base = (
        inherits.filter(F.col("obj_label").isin(*_CLASSY))
        .select(
            F.col("subj").alias("cls"),
            F.col("obj").alias("anc"),
            F.lit(1).alias("depth"),
            F.coalesce(
                F.col("props").getItem("base_index").cast("int"), F.lit(0)
            ).alias("ord"),
        )
        .distinct()
    )
    # eager=False + count(): the count action materializes the lazily-marked
    # checkpoint blocks itself, so checkpoint + convergence count are ONE
    # job per round instead of two (the lineage cut is identical — the
    # returned frame scans the checkpoint RDD either way). Safe here because
    # the count fully materializes the frame BEFORE any fan-out consumer
    # builds on it.
    clo = base.localCheckpoint(eager=False)
    n_prev = clo.count()
    for _ in range(doublings):
        ext = (
            clo.alias("x")
            .join(clo.alias("y"), F.col("x.anc") == F.col("y.cls"))
            .select(
                F.col("x.cls").alias("cls"),
                F.col("y.anc").alias("anc"),
                (F.col("x.depth") + F.col("y.depth")).alias("depth"),
                F.col("x.ord").alias("ord"),
            )
        )
        clo = (
            clo.unionByName(ext)
            .groupBy("cls", "anc")
            .agg(F.min(F.struct("depth", "ord")).alias("m"))
            .select("cls", "anc", F.col("m.depth").alias("depth"), F.col("m.ord").alias("ord"))
            .localCheckpoint(eager=False)  # materialized by the count below
        )
        # early exit: no new (cls, anc) pairs → the closure is complete
        # (typical hierarchies are depth ≤ 2; saves two checkpoint rounds
        # of the serial critical path)
        n = clo.count()
        if n == n_prev:
            break
        n_prev = n
    return clo


def mro_shadow_edges(
    entities: DataFrame,
    inherits: DataFrame,
    closure: DataFrame | None = None,
    scope_docs: DataFrame | None = None,
) -> DataFrame:
    """Cross-branch MRO shadow OVERRIDES (method_override.py:70-153).

    A mixin's method can shadow a same-name method from a SIBLING base
    branch only in a combining subclass's MRO (django's
    ``SearchVector(SearchVectorCombinable, Func)`` case): the nearest-
    ancestor walk cannot see it because the mixin never inherits the
    shadowed class. Per class, linearize the ancestry in reverse post-order
    (a C3-compatible stand-in, ``method_override.py:135-153``) and link each
    method name's FIRST provider to every LATER provider, skipping pairs the
    per-method ancestor walk already owns (shadowed ∈ ancestors(first)).

    Spark shape: each class ships its own (tiny) ancestor subgraph + the
    method names defined on those ancestors into one cogrouped-pandas task —
    classes parallelize, hierarchies are bounded, and the duplicated pairs
    from sibling descendants collapse in the final dedup.
    """
    import pandas as pd

    edges = inherits.filter(F.col("obj_label").isin(*_CLASSY)).select(
        F.col("subj"),
        F.col("obj"),
        F.coalesce(
            F.col("props").getItem("base_index").cast("int"), F.lit(0)
        ).alias("ord"),
    )
    if closure is None:
        closure = ancestor_closure(inherits)
    # nodes of each class's ancestor subgraph: the class itself + ancestors.
    # src_doc provenance = the ROOT class's doc (the combining subclass is
    # what makes the shadow exist), so the incremental path recomputes
    # exactly the roots whose docs are in scope.
    cls_docs = entities.filter(F.col("label").isin(*_CLASSY)).select(
        F.col("qn").alias("root"), F.col("doc_id").alias("root_doc")
    ).dropDuplicates(["root"])
    # a cross-branch shadow requires two ancestors neither of which inherits
    # the other — impossible unless some node in the root's ancestor
    # subgraph has ≥2 bases. Restrict the cogroup to those roots: in a
    # single-inheritance corpus this is EMPTY (measured: the unfiltered
    # per-class cogroup cost 54 s of pure Python group overhead at 20k docs)
    multi_base = (
        edges.groupBy("subj")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= 2)
        .select(F.col("subj").alias("mb"))
    )
    self_mb = multi_base.select(F.col("mb").alias("root"))
    anc_mb = (
        closure.join(multi_base, closure["anc"] == F.col("mb"), "left_semi")
        .select(F.col("cls").alias("root"))
    )
    roots = self_mb.unionByName(anc_mb).distinct()
    if scope_docs is not None:
        roots = roots.join(
            cls_docs.join(
                scope_docs.select(F.col("doc_id").alias("root_doc")),
                "root_doc",
                "left_semi",
            ),
            "root",
            "left_semi",
        )
    nodes = (
        closure.join(roots, closure["cls"] == roots["root"], "left_semi")
        .select(F.col("cls").alias("root"), F.col("anc").alias("node"))
        .unionByName(roots.select("root", F.col("root").alias("node")))
        # both cogroup sides join against this frame — cut the shared
        # lineage so Spark doesn't see an ambiguous self-join (tiny frame:
        # one row per (class, ancestor))
        .localCheckpoint(eager=True)
    )

    sub_edges = nodes.join(edges, nodes["node"] == edges["subj"]).select(
        "root", "subj", "obj", "ord"
    )
    methods = entities.filter(F.col("label") == "Method").select(
        F.col("parent_qn").alias("mcls"),
        F.col("name").alias("mname"),
        F.col("qualified_name").alias("mqn"),
    )
    # distinct column names on the second cogroup side: both sides descend
    # from the same `nodes` frame, and same-name attributes across the
    # cogroup children trip Spark's ambiguous-self-join check
    nodes_m = nodes.selectExpr("root AS mroot", "node AS mnode")
    sub_methods = nodes_m.join(
        methods, nodes_m["mnode"] == methods["mcls"]
    ).select("mroot", "mcls", "mname", "mqn")

    def shadow(key, epdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
        root = key[0]
        bases: dict[str, list[str]] = {}
        for r in epdf.itertuples():
            bases.setdefault(r.subj, []).append((r.ord, r.obj))
        bases = {k: [o for _, o in sorted(v)] for k, v in bases.items()}
        # reverse post-order: subclass precedes bases, diamonds sink
        order: list[str] = []
        expanded: set[str] = set()
        stack: list[tuple[str, bool]] = [(root, False)]
        while stack:
            cur, done = stack.pop()
            if done:
                order.append(cur)
                continue
            if cur in expanded:
                continue
            expanded.add(cur)
            stack.append((cur, True))
            stack.extend((b, False) for b in bases.get(cur, []))
        lin = list(reversed(order))

        meth: dict[tuple[str, str], list[str]] = {}
        names_by_cls: dict[str, set[str]] = {}
        for r in mpdf.itertuples():
            meth.setdefault((r.mcls, r.mname), []).append(r.mqn)
            names_by_cls.setdefault(r.mcls, set()).add(r.mname)

        providers: dict[str, list[str]] = {}
        for cls in lin:
            for nm in sorted(names_by_cls.get(cls, ())):
                providers.setdefault(nm, []).append(cls)

        def reachable(start: str) -> set[str]:
            seen: set[str] = set()
            todo = list(bases.get(start, ()))
            while todo:
                c = todo.pop()
                if c in seen:
                    continue
                seen.add(c)
                todo.extend(bases.get(c, ()))
            return seen

        rows: list[tuple[str, str, str]] = []
        for nm, classes in providers.items():
            if len(classes) < 2:
                continue
            first = classes[0]
            first_anc = reachable(first)
            for shadowed in classes[1:]:
                if shadowed in first_anc:
                    continue  # same-branch: the nearest-ancestor pass owns it
                for sq in sorted(meth[(first, nm)]):
                    for oq in sorted(meth[(shadowed, nm)]):
                        rows.append((root, sq, oq))
        return pd.DataFrame(rows, columns=["root", "subj", "obj"])

    pairs = (
        sub_edges.groupBy("root")
        .cogroup(sub_methods.groupBy("mroot"))
        .applyInPandas(shadow, schema="root string, subj string, obj string")
    )
    return (
        pairs.join(cls_docs, "root", "left")
        .select(
            "subj",
            F.lit("OVERRIDES").alias("pred"),
            "obj",
            F.lit("Method").alias("subj_label"),
            F.lit("Method").alias("obj_label"),
            F.col("root_doc").alias("src_doc"),
        )
        .dropDuplicates(["subj", "pred", "obj", "src_doc"])
    )


def override_edges(
    entities: DataFrame,
    inherits: DataFrame,
    closure: DataFrame | None = None,
    scope_docs: DataFrame | None = None,
) -> DataFrame:
    """Method OVERRIDES nearest ancestor method of the same name.

    One join pass over the precomputed ancestor closure instead of an
    adaptive BFS loop (nearest = min (depth, base order) per method).
    ``scope_docs`` (incremental) restricts the SUBJECT side to in-scope
    docs; the ancestor side stays global.
    """
    if closure is None:
        closure = ancestor_closure(inherits)
    methods = entities.filter(F.col("label") == "Method").select(
        F.col("parent_qn").alias("cls"),
        F.col("name").alias("mname"),
        F.col("qualified_name").alias("mqn"),
        F.col("doc_id").alias("mdoc"),
    )
    subj_methods = methods
    if scope_docs is not None:
        subj_methods = methods.join(
            scope_docs.select(F.col("doc_id").alias("mdoc")),
            "mdoc",
            "left_semi",
        )
    hits = (
        subj_methods.alias("m")
        .join(closure.alias("c"), F.col("m.cls") == F.col("c.cls"))
        .join(
            methods.alias("a"),
            (F.col("c.anc") == F.col("a.cls"))
            & (F.col("m.mname") == F.col("a.mname")),
        )
        .select(
            F.col("m.mqn").alias("subj"),
            F.col("a.mqn").alias("obj"),
            F.col("m.mdoc").alias("src_doc"),
            F.col("c.depth").alias("depth"),
            F.col("c.ord").alias("ord"),
        )
    )
    w = Window.partitionBy("subj").orderBy("depth", "ord", "obj")
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "subj",
            F.lit("OVERRIDES").alias("pred"),
            "obj",
            F.lit("Method").alias("subj_label"),
            F.lit("Method").alias("obj_label"),
            "src_doc",
        )
        .dropDuplicates(["subj", "pred", "obj", "src_doc"])
    )
