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


def pack_bins(
    documents: DataFrame,
    budget: int = 4096,
    n_shards: int = 64,
    key: str = "doc_id",
    salt: str = "pack-v1",
) -> DataFrame:
    """Greedy sequence packing: assign documents to ~``budget``-token bins
    for pretraining batch assembly.

    Documents are first hashed into ``n_shards`` independent shards (the
    scale unit: a 100 TB corpus packs shard-parallel — there is no global
    order, so no global sort and no single-partition window). Within a
    shard, documents are taken in deterministic ``key`` order and packed
    first-fit-in-order: a running token cumsum is computed with ONE window
    over (shard, key), and the bin index is ``floor((cumsum − n_tokens) /
    budget)`` — i.e. a document starts a new bin when the previous ones
    have consumed the budget. Oversized documents (> budget tokens) occupy
    bins alone-ish by construction (they advance the cumsum past the
    budget). Returns (doc_id, n_tokens, shard, bin_id, bin_pos).

    One shuffle (the shard/key sort window); everything else is codegen
    arithmetic. The assignment is a pure function of (key, text) — stable
    under re-partitioning and re-runs, the same hygiene argument as
    ``hash_split``.

    Sizing at scale: each shard is one window partition, i.e. one
    executor-side sort — pick ``n_shards`` so corpus_bytes / n_shards fits
    an executor's sort buffer (at 100 TB that is O(10⁴–10⁵) shards, not
    the test-scale default of 64). More shards never change bin contents
    WITHIN a shard, only how many independent packing streams exist.
    """
    from pyspark.sql import Window

    from code_graph_rag_spark.operators.text import n_tokens_col

    shard = (_bucket(F.col(key), salt) % n_shards).alias("shard")
    base = documents.select(
        key, n_tokens_col(F.col("text")).alias("n_tokens"), shard
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("shard", "bin_id").orderBy(key)
    return (
        base.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(budget)).cast(
                "long"
            ),
        )
        .withColumn("bin_pos", F.row_number().over(wp).cast("int"))
        .select(key, "n_tokens", "shard", "bin_id", "bin_pos")
    )
