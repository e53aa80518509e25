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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from code_graph_rag_spark.extract.mentions import extract_mentions
from code_graph_rag_spark.pipeline import GraphResult, build_graph_from_mentions
from code_graph_rag_spark.schema import MENTIONS_SCHEMA


def doc_hashes(documents: DataFrame) -> DataFrame:
    """(doc_id, doc_hash): md5 over the canonical span serialization —
    kind/text/media_ref/offset in offset order (the span-sequence identity)."""
    by_offset = F.array_sort(
        F.col("spans"),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    canon = F.array_join(
        F.transform(
            by_offset,
            lambda s: F.concat_ws(
                "\x01", s["kind"], s["text"], s["media_ref"], s["offset"]
            ),
        ),
        "\x02",
    )
    return documents.select("doc_id", F.md5(canon).alias("doc_hash"))


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


def full_build(
    spark: SparkSession, documents: DataFrame, store: StageStore
) -> GraphResult:
    """Full pipeline with persisted stages: doc_hashes → mentions → graph."""
    store.write_stage("doc_hashes", doc_hashes(documents))
    raw = extract_mentions(documents)
    store.write_stage("mentions", raw)
    mentions = store.read_stage(spark, "mentions")
    g = build_graph_from_mentions(mentions)
    store.write_stage("nodes", g.nodes)
    store.write_stage("edges", g.edges)
    return g


def incremental_build(
    spark: SparkSession, new_documents: DataFrame, store: StageStore
) -> tuple[GraphResult, dict]:
    """Incremental sync against the persisted stages.

    Returns (graph, stats). Falls back to a full build when no previous
    state exists (``has_stage`` doubles as the resume probe: a run killed
    after the mentions stage resumes from it for free)."""
    if not (store.has_stage("doc_hashes") and store.has_stage("mentions")):
        g = full_build(spark, new_documents, store)
        return g, {"mode": "full"}

    old_hashes = store.read_stage(spark, "doc_hashes")
    changed, deleted = diff_documents(old_hashes, new_documents)
    changed = changed.persist()
    n_changed = changed.count()
    n_deleted = deleted.count()

    old_mentions = store.read_stage(spark, "mentions")
    if n_changed == 0 and n_deleted == 0:
        # in-sync probe short-circuit (graph_updater.py:1538-1577)
        g = build_graph_from_mentions(old_mentions)
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
    mentions = store.read_stage(spark, "mentions")
    g = build_graph_from_mentions(mentions)
    store.write_stage("nodes", g.nodes)
    store.write_stage("edges", g.edges)
    changed.unpersist()
    return g, {"mode": "incremental", "changed": n_changed, "deleted": n_deleted}
