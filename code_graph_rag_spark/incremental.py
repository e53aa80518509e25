"""Incremental sync + per-stage persisted lineage (resume from checkpoint).

Reference semantics (``graph_updater.py:129-165,1633-1812``): per-file hash
diff against the previous run → recompute only changed files → reconcile
deletions. Our translation keeps the reference's eval oracle — **incremental
result ≡ clean full rebuild** (``evals/README.md:153-217``) — *by
construction*: the persisted stage artifact is the raw mentions table;
an incremental run

1. hashes the new documents (one md5 over the canonical span serialization —
   the ``graph_updater._hash_file`` analogue),
2. anti-joins the stored mention table against changed ∪ deleted doc_ids,
3. re-extracts ONLY changed/new documents (the expensive parse stage),
4. unions and reruns the join phase (``build_graph_from_mentions``).

Extraction is never repeated for unchanged docs; the join phase is identical
to a full rebuild over the same mentions, so the two are equal row-for-row.

Storage is plain parquet "stage tables" + a JSON lineage sidecar with
per-stage row counts, input fingerprints and durations — the resume-from-
stage contract of the north rule (Iceberg jars are not in this image; the
layout is Iceberg-shaped: swap ``_write``/``_read`` for ``writeTo`` /
``MERGE INTO`` when the runtime is present).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path

# module-level so pandas_udf type-hint resolution works under
# ``from __future__ import annotations`` (stringified hints are evaluated
# against the function's module globals)
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from code_graph_rag_spark.extract.mentions import extract_mentions
from code_graph_rag_spark.pipeline import (
    GraphResult,
    _materialize,
    assemble_graph,
    build_graph_from_mentions,
    disambiguate_modules,
)
from code_graph_rag_spark.plans.variants import mint_entities
from code_graph_rag_spark.schema import DEFAULT_GROUPS, MENTIONS_SCHEMA

_DEF_KINDS = ("module", "function", "class", "method", "interface", "enum")


def _last_seg(col: str):
    return F.element_at(F.split(F.col(col), "\\."), -1)


def blast_radius(
    old_mentions: DataFrame,
    spliced: DataFrame,
    ch_docs: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """Docs whose emitted edges could differ from the previous build.

    The resolution ladder can only produce a different answer for a mention
    if some rung's *target name* changed: every rung's candidate QN ends
    with either the callee's last segment or an imported symbol's name. So
    the blast radius is computable by name, declaratively:

    1. qn-changing docs (QCD): changed ∪ deleted docs, plus docs whose
       module_qn collides with one (their variant/disambiguation winners
       may flip);
    2. name delta: entity names + qns defined in QCD (old ∪ new versions);
    3. resolvers: docs with a call/ref/inherit mention whose callee last
       segment is in the delta, an import naming it, a definition sharing a
       delta name (their OVERRIDES target can change) or qn (variant
       partitions), or a colliding module;
    4. inheritance descent: docs inheriting (transitively) from a delta
       class — their closure-derived edges (super()/OVERRIDES/MRO) change.

    Every step is a semi-join of the mention table against a small
    broadcast name set: the big table is scanned, never shuffled, and only
    matching rows move (the O(changed) contract).
    """
    # 1. QCD: changed ∪ deleted ∪ module-qn collision partners
    ch_mods = (
        old_mentions.unionByName(spliced)
        .join(ch_docs, "doc_id", "left_semi")
        .filter(F.col("kind") == "module")
        .select(F.col("qn").alias("mqn"))
        .distinct()
    )
    colliders = (
        spliced.filter(F.col("kind") == "module")
        .join(F.broadcast(ch_mods), F.col("qn") == F.col("mqn"), "left_semi")
        .select("doc_id")
        .distinct()
    )
    qcd = ch_docs.unionByName(colliders).distinct().localCheckpoint(eager=True)

    # 2. name/qn delta from old + new versions of QCD docs
    delta_defs = (
        old_mentions.unionByName(spliced)
        .join(qcd, "doc_id", "left_semi")
        .filter(F.col("kind").isin(*_DEF_KINDS))
    )
    names = delta_defs.select(F.col("name").alias("n")).where(
        F.col("n").isNotNull()
    ).distinct().localCheckpoint(eager=True)
    qns = delta_defs.select(F.col("qn").alias("dq")).distinct()

    # 3. resolvers
    callers = (
        spliced.filter(F.col("kind").isin("call", "ref", "inherit"))
        .join(F.broadcast(names), _last_seg("callee") == F.col("n"), "left_semi")
        .select("doc_id")
    )
    importers = (
        spliced.filter(F.col("kind") == "import")
        .join(
            F.broadcast(names),
            (F.col("name") == F.col("n"))
            | (_last_seg("target") == F.col("n")),
            "left_semi",
        )
        .select("doc_id")
    )
    def_sharers = (
        spliced.filter(F.col("kind").isin(*_DEF_KINDS))
        .join(F.broadcast(names), F.col("name") == F.col("n"), "left_semi")
        .select("doc_id")
    )
    qn_sharers = (
        spliced.filter(F.col("kind").isin(*_DEF_KINDS))
        .join(F.broadcast(qns), F.col("qn") == F.col("dq"), "left_semi")
        .select("doc_id")
    )
    # module-system coupling: a changed/deleted interface or implementation
    # unit can flip another unit's deferred IMPLEMENTS link (the no-phantom
    # gate, pipeline.py), so every doc declaring the same module name as a
    # QCD doc joins the radius. Declared names, not entity names — the
    # interface key never appears as a def name.
    mod_delta = (
        old_mentions.unionByName(spliced)
        .join(qcd, "doc_id", "left_semi")
        .filter(F.col("kind").isin("module_interface", "module_impl"))
        .select(F.col("target").alias("mt"))
        .distinct()
    )
    mod_resolvers = (
        spliced.filter(F.col("kind").isin("module_interface", "module_impl"))
        .join(F.broadcast(mod_delta), F.col("target") == F.col("mt"), "left_semi")
        .select("doc_id")
    )
    affected = (
        qcd.unionByName(callers)
        .unionByName(importers)
        .unionByName(def_sharers)
        .unionByName(qn_sharers)
        .unionByName(mod_resolvers)
        .distinct()
        .localCheckpoint(eager=True)
    )

    # 4. inheritance descent to fixpoint (bounded like the ancestor closure)
    frontier = names
    seen = names
    for _ in range(max_depth):
        hit_docs = (
            spliced.filter(F.col("kind") == "inherit")
            .join(
                F.broadcast(frontier),
                _last_seg("callee") == F.col("n"),
                "left_semi",
            )
            .select("doc_id")
            .distinct()
        )
        new_names = (
            spliced.filter(F.col("kind").isin("class", "interface", "enum"))
            .join(hit_docs, "doc_id", "left_semi")
            .select(F.col("name").alias("n"))
            .distinct()
            .join(seen, "n", "left_anti")
            .localCheckpoint(eager=True)
        )
        affected = affected.unionByName(hit_docs).distinct()
        if new_names.isEmpty():
            break
        seen = seen.unionByName(new_names).localCheckpoint(eager=True)
        frontier = new_names

    # 5. variant-window closure: a doc pulled into scope re-mints its
    # entities, so every OTHER doc defining one of its qns must re-mint in
    # the same window (else the scoped variant assignment can differ from a
    # full rebuild's). Sharing a qn is symmetric, but newly pulled docs
    # bring their other qns — expand to a bounded fixpoint.
    affected = affected.localCheckpoint(eager=True)
    defs = spliced.filter(F.col("kind").isin(*_DEF_KINDS))
    converged = False
    for _ in range(3):
        aff_qns = (
            defs.join(affected, "doc_id", "left_semi")
            .select(F.col("qn").alias("aq"))
            .distinct()
        )
        sharers = (
            defs.join(F.broadcast(aff_qns), F.col("qn") == F.col("aq"), "left_semi")
            .select("doc_id")
            .distinct()
            .join(affected, "doc_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if sharers.isEmpty():
            converged = True
            break
        affected = affected.unionByName(sharers).distinct().localCheckpoint(
            eager=True
        )
    if not converged:
        # the bounded fixpoint did not drain: without a fallback a scoped
        # rebuild could silently diverge from a full rebuild (remaining
        # sharers' variant windows would re-mint from a partial set). The
        # qn-sharing closure can never exceed {docs defining a qn that
        # more than one doc defines}, so folding ALL of those in is a
        # one-shot, provably-safe over-approximation.
        dup_qns = (
            defs.groupBy("qn")
            .agg(F.countDistinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") > 1)
            .select("qn")
        )
        dup_docs = (
            defs.join(dup_qns, "qn", "left_semi").select("doc_id").distinct()
        )
        affected = (
            affected.unionByName(dup_docs)
            .distinct()
            .localCheckpoint(eager=True)
        )
    return affected


def doc_hashes(documents: DataFrame) -> DataFrame:
    """(doc_id, doc_hash): md5 over the canonical span serialization —
    kind/text/media_ref/offset in offset order (the span-sequence identity).

    Kernel-side Arrow hash (not an array HOF, not a shuffle): this is the
    per-document hot path of every incremental sync, so the fold must stay
    shuffle-free and linear. The previous ``array_sort``+``transform`` form
    was an interpreted per-span expression (the repo HOF rule); the
    posexplode+window alternative would shuffle the full document TEXT just
    to hash it — at 100 TB that is the bottleneck. A pandas_udf moves the
    bytes once over Arrow inside the scan and hashes at C speed. The
    serialization is byte-identical to the old expression (concat_ws
    null-skip semantics included), so stored hash tables stay valid."""
    import hashlib

    @F.pandas_udf("string")
    def _span_hash(spans: pd.Series) -> pd.Series:
        out = []
        for row in spans:
            if row is None or len(row) == 0:
                out.append(hashlib.md5(b"").hexdigest())
                continue
            pieces = []
            for s in sorted(
                row,
                key=lambda s: (
                    s["offset"] if s is not None and s["offset"] is not None
                    else -1
                ),
            ):
                vals = (
                    [s["kind"], s["text"], s["media_ref"], s["offset"]]
                    if s is not None
                    else []
                )
                pieces.append(
                    "\x01".join(
                        str(v) for v in vals if v is not None
                    )
                )
            out.append(
                hashlib.md5("\x02".join(pieces).encode("utf-8")).hexdigest()
            )
        return pd.Series(out)

    return documents.select(
        "doc_id", _span_hash(F.col("spans")).alias("doc_hash")
    )


def diff_documents(
    old_hashes: DataFrame, new_documents: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(changed_or_new doc_ids, deleted doc_ids) via full-outer hash join —
    the reference's hash-cache diff (``graph_updater.py:1633-1714``)."""
    new_hashes = doc_hashes(new_documents)
    o = old_hashes.select(
        F.col("doc_id"), F.col("doc_hash").alias("old_hash")
    )
    n = new_hashes.select(F.col("doc_id"), F.col("doc_hash").alias("new_hash"))
    joined = o.join(n, "doc_id", "full_outer")
    changed = joined.filter(
        F.col("new_hash").isNotNull()
        & (F.col("old_hash").isNull() | (F.col("old_hash") != F.col("new_hash")))
    ).select("doc_id")
    deleted = joined.filter(F.col("new_hash").isNull()).select("doc_id")
    return changed, deleted


@dataclass
class StageStore:
    """Parquet-backed stage tables with versioned snapshots + lineage.

    Every ``write_stage`` creates a NEW snapshot directory ``name/v<N>``
    (never overwriting the version a reader may still be streaming from —
    the parquet stand-in for Iceberg snapshot isolation) and records the
    current version + row count + duration in the lineage sidecar. Readers
    pin to the committed version; old snapshots beyond ``retain`` are
    pruned."""

    root: str
    retain: int = 2

    def _vpath(self, name: str, version: int) -> str:
        return str(Path(self.root) / name / f"v{version}")

    def write_stage(self, name: str, df: DataFrame, **metrics) -> dict:
        t0 = time.time()
        lineage = self.lineage()
        version = int(lineage.get(name, {}).get("version", 0)) + 1
        path = self._vpath(name, version)
        df.write.mode("overwrite").parquet(path)
        spark = df.sparkSession
        n = spark.read.parquet(path).count()
        entry = {
            "stage": name,
            "version": version,
            "rows": n,
            "secs": round(time.time() - t0, 2),
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            **metrics,
        }
        lineage[name] = entry
        Path(self.root).mkdir(parents=True, exist_ok=True)
        (Path(self.root) / "_lineage.json").write_text(
            json.dumps(lineage, indent=1, sort_keys=True)
        )
        # prune snapshots older than the retention window
        import shutil

        for old in range(1, version - self.retain + 1):
            shutil.rmtree(self._vpath(name, old), ignore_errors=True)
        return entry

    def merge_stage(
        self,
        name: str,
        updates: DataFrame,
        key_cols: list[str],
        delete_keys: DataFrame | None = None,
        mode: str = "merge",
    ) -> dict:
        """MERGE INTO-shaped upsert (the reference's create-vs-merge write
        mode, ``services/graph_service.py:108-119,512-546``; Iceberg
        ``MERGE INTO`` semantics on the parquet stand-in).

        ``mode='create'`` replaces the stage outright (the reference's
        create mode drops-and-rewrites); ``mode='merge'`` upserts: rows
        matching ``updates`` on ``key_cols`` are replaced, ``delete_keys``
        rows are removed, everything else is carried over — written as a
        NEW snapshot version (snapshot isolation preserved)."""
        if mode == "create" or not self.has_stage(name):
            return self.write_stage(name, updates, mode=mode)
        spark = updates.sparkSession
        current = self.read_stage(spark, name)
        kept = current.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti"
        )
        if delete_keys is not None:
            kept = kept.join(
                delete_keys.select(*key_cols).distinct(),
                key_cols,
                "left_anti",
            )
        merged = kept.unionByName(updates.select(*current.columns))
        return self.write_stage(name, merged, mode=mode)

    def read_stage(self, spark: SparkSession, name: str) -> DataFrame:
        version = int(self.lineage()[name]["version"])
        return spark.read.parquet(self._vpath(name, version))

    def has_stage(self, name: str) -> bool:
        lin = self.lineage()
        if name not in lin:
            return False
        version = int(lin[name]["version"])
        return (Path(self._vpath(name, version)) / "_SUCCESS").exists()

    def lineage(self) -> dict:
        p = Path(self.root) / "_lineage.json"
        return json.loads(p.read_text()) if p.exists() else {}


def _write_graph_stages(store: StageStore, g: GraphResult) -> None:
    store.write_stage("entities", g.entities)
    store.write_stage("edges_prov", g.edges_prov)
    store.write_stage("nodes", g.nodes)
    store.write_stage("edges", g.edges)


def full_build(
    spark: SparkSession,
    documents: DataFrame,
    store: StageStore,
    groups: tuple[str, ...] = DEFAULT_GROUPS,
) -> GraphResult:
    """Full pipeline with persisted stages: doc_hashes → mentions → graph.

    Extraction stays group-less (ALL fact kinds reach the mentions stage) so
    a later build with a wider ``groups`` reuses the stored stage; only the
    join phase is gated."""
    store.write_stage("doc_hashes", doc_hashes(documents))
    raw = extract_mentions(documents)
    store.write_stage("mentions", raw)
    mentions = store.read_stage(spark, "mentions")
    g = build_graph_from_mentions(mentions, groups)
    _write_graph_stages(store, g)
    return g


def incremental_build(
    spark: SparkSession,
    new_documents: DataFrame,
    store: StageStore,
    scope_threshold: float = 0.5,
    groups: tuple[str, ...] = DEFAULT_GROUPS,
) -> tuple[GraphResult, dict]:
    """Incremental sync against the persisted stages.

    Returns (graph, stats). Falls back to a full build when no previous
    state exists (``has_stage`` doubles as the resume probe: a run killed
    after the mentions stage resumes from it for free).

    When the previous entity/edge-provenance stages exist, the join phase
    runs SCOPED: only the blast-radius docs' mentions re-enter the ladder;
    everything else is a per-doc delete+insert on the provenance table (the
    reference's inbound-edge capture/restore, ``graph_updater.py:1227-1284``,
    re-expressed as keep/recompute by ``src_doc``). ``scope_threshold``
    falls back to the full join phase when the radius covers most docs.
    """
    if not (store.has_stage("doc_hashes") and store.has_stage("mentions")):
        g = full_build(spark, new_documents, store, groups=groups)
        return g, {"mode": "full"}

    old_hashes = store.read_stage(spark, "doc_hashes")
    changed, deleted = diff_documents(old_hashes, new_documents)
    changed = changed.persist()
    deleted = deleted.persist()
    n_changed = changed.count()
    n_deleted = deleted.count()

    old_mentions = store.read_stage(spark, "mentions")
    if n_changed == 0 and n_deleted == 0:
        # in-sync probe short-circuit (graph_updater.py:1538-1577): serve
        # the graph straight from the stored stages when they exist — the
        # noop probe must not rerun the join phase
        changed.unpersist()
        deleted.unpersist()
        if store.has_stage("nodes") and store.has_stage("edges"):
            g = GraphResult(
                nodes=store.read_stage(spark, "nodes"),
                edges=store.read_stage(spark, "edges"),
                mentions=old_mentions,
                entities=store.read_stage(spark, "entities")
                if store.has_stage("entities")
                else None,
            )
        else:
            g = build_graph_from_mentions(old_mentions, groups)
        return g, {"mode": "noop", "changed": 0, "deleted": 0}

    keep = old_mentions.join(changed, "doc_id", "left_anti").join(
        new_documents.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    changed_docs = new_documents.join(changed, "doc_id", "left_semi")
    fresh = extract_mentions(changed_docs)
    mentions = keep.select(*[f.name for f in MENTIONS_SCHEMA.fields]).unionByName(
        fresh.select(*[f.name for f in MENTIONS_SCHEMA.fields])
    )

    # persist the new state (delete+insert per changed doc partition — the
    # parquet stand-in for Iceberg MERGE INTO)
    store.write_stage(
        "doc_hashes", doc_hashes(new_documents), changed=n_changed, deleted=n_deleted
    )
    store.write_stage("mentions", mentions)
    spliced = store.read_stage(spark, "mentions")
    stats: dict = {"changed": n_changed, "deleted": n_deleted}

    scoped_ok = store.has_stage("entities") and store.has_stage("edges_prov")
    if scoped_ok:
        ch_docs = changed.unionByName(deleted).distinct()
        affected = blast_radius(old_mentions, spliced, ch_docs)
        n_affected = affected.count()
        n_total = spliced.select("doc_id").distinct().count()
        stats.update(scoped_docs=n_affected, total_docs=n_total)
        if n_affected > scope_threshold * n_total:
            scoped_ok = False
            stats["mode"] = "incremental_full_join"
    else:
        stats["mode"] = "incremental_full_join"

    if scoped_ok:
        old_entities = store.read_stage(spark, "entities")
        old_prov = store.read_stage(spark, "edges_prov")
        scoped_raw = spliced.join(affected, "doc_id", "left_semi")
        # global collision window: a scoped doc must get the SAME
        # disambiguation winner a full rebuild gives it (ADVICE r2)
        global_mods = spliced.filter(F.col("kind") == "module")
        scoped_mentions = _materialize(
            disambiguate_modules(scoped_raw, module_mentions=global_mods),
            "scoped-mentions",
        )
        # global resolution facts for the typed-receiver/chained rungs:
        # out-of-scope docs' `returns` + `import` rows (the import rows let
        # a return-type expr like `Circle` expand through its own module's
        # alias map), disambiguated consistently with the global window.
        # `contract_op` rows ride along for the io group: contract linking's
        # ambiguity window ("two ops with one key claim nothing") must see
        # EVERY declared operation, and a scoped artefact must link to an
        # unchanged contract doc's operation.
        aux_returns = disambiguate_modules(
            spliced.filter(
                F.col("kind").isin("returns", "import", "contract_op")
            ).join(affected, "doc_id", "left_anti"),
            module_mentions=global_mods,
        )
        stats["scoped_mention_rows"] = scoped_mentions.count()
        entities = _materialize(
            old_entities.join(affected, "doc_id", "left_anti").unionByName(
                mint_entities(scoped_mentions)
            ),
            "entities-merged",
        )
        kept = (
            old_prov.filter(F.col("src_doc").isNotNull())
            .join(affected, old_prov["src_doc"] == affected["doc_id"], "left_anti")
            .join(
                spliced.select(F.col("doc_id").alias("src_doc")).distinct(),
                "src_doc",
                "left_semi",
            )
        )
        g = assemble_graph(
            scoped_mentions,
            entities,
            all_docs=spliced.select("doc_id").distinct(),
            kept_edges_prov=kept,
            scope_docs=affected,
            aux_mentions=aux_returns,
            groups=groups,
        )
        stats["mode"] = "incremental_scoped"
    else:
        g = build_graph_from_mentions(spliced, groups)

    _write_graph_stages(store, g)
    changed.unpersist()
    deleted.unpersist()
    return g, stats
