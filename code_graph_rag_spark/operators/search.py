"""Lexical (BM25) retrieval over the documents table.

Complements the embedding-side retrieval stack (``operators/similarity.py``
brute-force + multi-probe LSH, ``operators/ivf.py`` IVF) with the classic
sparse ranking function — the hybrid-retrieval counterpart every
training-data / RAG pipeline needs next to ANN. The reference's retrieval
is embedding-only (`vector_store.py`); BM25 here is the scale path for
keyword querying the same corpus.

Scoring (Robertson/Okapi BM25, the "+1 idf" variant that keeps idf
positive for common terms):

    idf(t)  = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))
    s(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 - b + b·dl/avgdl))

Design for 100 TB:

* Query terms are a tiny constant list → per-term tf becomes ONE codegen
  ``regexp_count`` column each over the normalized text. No explode, no
  per-token shuffle, no inverted index build for ad-hoc queries: the scan
  is a single stage, and Parquet column pruning reads only (doc_id, text).
* Corpus statistics (N, avgdl, per-term df) are ONE 1-row aggregate,
  broadcast back with a crossJoin — fully declarative, no driver action.
* The score is folded in fixed (sorted-term) order, so the float result is
  reproducible run-to-run and bit-comparable with the DuckDB oracle.
* Top-k is ``orderBy(...).limit(k)`` — Spark's TakeOrdered (per-partition
  heap + k-row driver merge), never a global sort.

For a *served* (repeated-query) workload the right structure is a
materialized inverted index (term → postings) — that is the persisted
``doc_shingles``-style layout; this operator is the ad-hoc scan path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from code_graph_rag_spark.operators.text import n_tokens_col, norm_text


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    Returns (doc_id, bm25 rounded to 6, rank) for the ``k`` best-scoring
    documents with score > 0 (≥1 query term present). Deterministic
    ordering: raw score desc, doc_id asc.
    """
    terms = sorted({t.lower() for t in query_terms})
    padded = F.concat(F.lit(" "), norm_text(F.col("text")), F.lit(" "))
    tf_cols = [
        F.regexp_count(
            padded, F.lit("(?<= )" + re.escape(t) + "(?= )")
        ).alias(f"tf_{i}")
        for i, t in enumerate(terms)
    ]
    scored = documents.select(
        "doc_id", n_tokens_col(F.col("text")).alias("dl"), *tf_cols
    )
    stats = scored.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    j = scored.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(terms)):  # fixed fold order = sorted terms
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        score = score + idf * tf * (k1 + 1.0) / denom
    top = (
        j.select("doc_id", score.alias("s"))
        .filter(F.col("s") > 0)
        .orderBy(F.desc("s"), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.desc("s"), "doc_id")  # k rows only — single task OK
    return top.select(
        "doc_id",
        F.round("s", 6).alias("bm25"),
        F.row_number().over(w).cast("int").alias("rank"),
    )
