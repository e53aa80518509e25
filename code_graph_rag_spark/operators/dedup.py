"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB regime:

* **exact**: one hash-aggregate on a 60-bit content hash — a single shuffle
  on the hash key, map-side partial aggregation, no data skew (hashes are
  uniform).
* **MinHash + LSH banding**: shingle → K portable hash functions →
  per-document signature (one explode + groupBy) → band keys → candidate
  pairs via an equi-join on (band, band-hash). Candidate verification is a
  signature comparison, NOT a text comparison, so the join payload stays
  tiny. Pairwise work is confined to LSH buckets — never O(N²).
* **n-gram Jaccard**: exact verification on the shingle sets, via an
  explode + self-join on shingle (inverted-index join), group-count, and the
  |A∩B| / (|A|+|B|-|A∩B|) identity — the classic "jaccard without pairs
  materialization" plan.
* **SimHash**: 64-bit sign-aggregated fingerprint, vectorized in pandas
  (Arrow batches), hamming-bucket join on rotated prefixes.

All hash functions are md5-derived and portable to DuckDB so the driver's
oracle can replay them in SQL (see ``__spark_entry__``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import (
    doc_shingles as _doc_shingles,
    hash60,
    norm_text,
)

MOD = 1_000_000_007


def _perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations."""
    rng_a = [1_000_003, 999_983, 101_111, 777_767, 424_243]
    out = []
    for i in range(k):
        a = (rng_a[i % len(rng_a)] * (i + 1) * 2 + 1) % MOD
        b = (i * 912_871 + 7) % MOD
        out.append((a, b))
    return out


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (after normalization) documents.

    Returns (content_hash, n_docs, doc_ids sorted, keeper = min doc_id).
    One shuffle on the 60-bit hash.
    """
    h = hash60(norm_text(F.col("text"))).alias("content_hash")
    return (
        documents.select(h, "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .filter(F.col("n_docs") > 1)
    )


def doc_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded, distinct per doc (codegen path — see
    operators.text.doc_shingles)."""
    return _doc_shingles(documents, n)


def minhash_signatures(
    documents: DataFrame, k: int = 16, n: int = 3
) -> DataFrame:
    """(doc_id, sig: array<long>[k]) MinHash signatures.

    Plan shape: explode shingles → hash once → k affine transforms → one
    groupBy(doc_id) with k min() partial aggregations (map-side combine
    means the shuffle carries k longs per doc, not the shingles).
    """
    sh = doc_shingles(documents, n).withColumn(
        "h", hash60(F.col("shingle")) % MOD
    )
    aggs = [
        F.min((F.col("h") * a + b) % MOD).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_params(k))
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[f"m{i}" for i in range(k)]).alias("sig")
    )


def lsh_candidate_pairs(
    documents: DataFrame, k: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates.

    Band the k-row signature into ``bands`` bands of k/bands rows; docs
    agreeing on any full band collide. Returns (doc_a, doc_b, sig_agree =
    fraction of matching signature rows) with doc_a < doc_b.
    """
    r = k // bands
    # persist: the signature pipeline feeds both sides of the band self-join
    # (unpersisted it is computed twice — measured 2x on the sf0.1 bench)
    sigs = minhash_signatures(documents, k, n).persist()
    banded = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.concat_ws(",", *[F.col("sig")[i] for i in range(b * r, (b + 1) * r)]))
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sig").alias("sig_a"),
        "band",
        "band_hash",
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        "band",
        "band_hash",
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    agree = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda x: x,
            )
        ).cast("double")
        / F.lit(float(k))
    )
    return pairs.select(
        "doc_a", "doc_b", F.round(agree, 6).alias("sig_agree")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index self-join: |A∩B| from the join group counts, |A|,|B|
    from per-doc shingle counts — pairs never materialize text. Hub shingles
    (boilerplate) are the skew risk at scale; AQE skew-join plus an optional
    document-frequency cap handle it.
    """
    sh = doc_shingles(documents, n)
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return jac.select("doc_a", "doc_b", "n_common", "jaccard")


def simhash(documents: DataFrame, bits: int = 64, n: int = 3) -> DataFrame:
    """64-bit SimHash over word shingles, vectorized per Arrow batch.

    Bit b of the fingerprint is the sign of Σ_shingles (±1 by shingle-hash
    bit b). Python stays out of the per-row path: one numpy popcount matrix
    per batch.
    """
    import numpy as np

    exploded = doc_shingles(documents, n).withColumn(
        "h", hash60(F.col("shingle"))
    )

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"doc_id": [], "bit": [], "contrib": []})
                continue
            h = pdf["h"].to_numpy(dtype=np.int64)
            bits_m = ((h[:, None] >> np.arange(bits)[None, :]) & 1) * 2 - 1
            rows = np.repeat(pdf["doc_id"].to_numpy(), bits)
            yield pd.DataFrame(
                {
                    "doc_id": rows,
                    "bit": np.tile(np.arange(bits), len(pdf)),
                    "contrib": bits_m.reshape(-1),
                }
            )

    contribs = exploded.mapInPandas(
        _batch, schema="doc_id long, bit int, contrib long"
    )
    agg = (
        contribs.groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn("bitval", (F.col("s") > 0).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("bitval") * F.pow(F.lit(2.0), F.col("bit")).cast("long")
            ).alias("simhash")
        )
    )
    return agg


def dedup_keep_first(documents: DataFrame) -> DataFrame:
    """The end-to-end exact-dedup operator: keep the lowest doc_id per
    normalized-content group (deterministic winner)."""
    h = hash60(norm_text(F.col("text"))).alias("content_hash")
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        documents.select("*", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "content_hash")
    )
