"""Deterministic dataset splitting / sampling for training-data pipelines.

Both operators are pure row-local codegen expressions — no shuffle, no
sort, no RNG state: the split/sample decision is a function of a portable
60-bit md5 hash of the document key, so

* the assignment is REPRODUCIBLE across runs, engines and cluster sizes
  (the classic requirement for train/val/test hygiene — re-running the
  pipeline must never migrate a training doc into the eval split);
* at 100 TB the operator is a single map stage fused into the scan
  (filters push down; no repartition, no sample() RNG whose result depends
  on partitioning);
* the DuckDB oracle replays the hash bit-for-bit (same md5-prefix trick as
  every other portable hash in this repo).

``hash60 % 10_000`` gives a 4-decimal-digit bucket; thresholds are
expressed in basis points so fractions like 0.5 % are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import hash60


def _bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000) from a salted portable hash."""
    return hash60(F.concat(F.lit(salt), key.cast("string"))) % 10_000


def hash_split(
    documents: DataFrame,
    key: str = "doc_id",
    train_bp: int = 9_000,
    val_bp: int = 500,
    salt: str = "split-v1",
) -> DataFrame:
    """Assign train/val/test splits by hashed key.

    ``train_bp``/``val_bp`` are basis points (of 10,000): the default is
    90 % / 5 % / 5 %. Returns the input columns plus ``split``. The salt
    versions the assignment — bump it to reshuffle, keep it to freeze.
    """
    b = _bucket(F.col(key), salt)
    split = (
        F.when(b < train_bp, F.lit("train"))
        .when(b < train_bp + val_bp, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return documents.withColumn("split", split)


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, int],
    stratum_col: str = "lang",
    key: str = "doc_id",
    default_bp: int = 0,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a document iff its hash
    bucket falls below its stratum's threshold (basis points of 10,000).

    ``fractions`` maps stratum value → basis points (e.g. ``{"en": 5000,
    "de": 10000}`` keeps 50 % of English and all German docs); strata not
    listed fall back to ``default_bp``. Unlike ``DataFrame.sample`` this is
    exact-reproducible (partitioning-independent) and per-stratum without a
    groupBy — the threshold lookup compiles to a CASE chain, so the whole
    operator stays inside the scan stage.
    """
    b = _bucket(F.col(key), salt)
    thresh = None
    for stratum in sorted(fractions):
        cond = F.col(stratum_col) == stratum
        bp = F.lit(fractions[stratum])
        thresh = F.when(cond, bp) if thresh is None else thresh.when(cond, bp)
    thresh = (
        thresh.otherwise(F.lit(default_bp))
        if thresh is not None
        else F.lit(default_bp)
    )
    return documents.filter(b < thresh)
