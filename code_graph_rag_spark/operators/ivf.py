"""IVF (inverted-file) ANN — the partition-pruned scale path.

``lsh_topk`` (operators/similarity.py) prunes with data-independent
hyperplanes; IVF prunes with a **coarse quantizer**: every corpus vector is
assigned to its nearest centroid cell, the cell id becomes a partition /
cluster key, and a query only scans its ``n_probe`` nearest cells — at 100 TB
the assigned corpus is written bucketed by ``cell`` so a probe is a
partition-pruned scan + equi-join, never a full pass.

The quantizer here is the deterministic **seed-document** variant: centroids
are the embeddings of the ``n_cells`` lowest ``vec_id`` rows. That keeps the
whole index bit-replayable in the DuckDB oracle (same seeds, same in-order
float folds). A production deployment swaps in sampled k-means centroids —
assignment, probing, rerank and the physical plan are identical; only the
centroid matrix changes.

All vector math is numpy over Arrow batches (no interpreted array HOFs), and
every dot/norm is accumulated STRICTLY in list order (see
``similarity._seq_dots``) so centroid argmax decisions match the oracle's
``list_aggregate`` folds bit-for-bit.

Reference parity: the reference's vector store is a flat per-collection scan
(``vector_store.py``); IVF is the scale-path generalization our engine adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from code_graph_rag_spark.operators.similarity import (
    _SCORE_SCHEMA,
    _to_matrix,
)


def _seq_cosines(e: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n, dim) × (c, dim) → (n, c) cosine, every fold in dim order 0..d-1
    (dot AND both squared norms), matching DuckDB's list_aggregate."""
    n, d = e.shape
    c = cents.shape[0]
    dots = np.zeros((n, c))
    en = np.zeros(n)
    cn = np.zeros(c)
    for j in range(d):
        dots += np.outer(e[:, j], cents[:, j])
        en += e[:, j] * e[:, j]
        cn += cents[:, j] * cents[:, j]
    return dots / np.maximum(
        np.sqrt(en)[:, None] * np.sqrt(cn)[None, :], 1e-300
    )


def seed_centroids(corpus: DataFrame, n_cells: int) -> np.ndarray:
    """Centroid matrix = embeddings of the n_cells lowest vec_ids (tiny,
    driver-side by design — the broadcast quantizer)."""
    rows = (
        corpus.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(n_cells)
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def assign_cells(
    corpus: DataFrame, cents: np.ndarray, id_col: str = "vec_id"
) -> DataFrame:
    """Append the nearest-centroid ``cell`` column (argmax cosine, ties to
    the lowest cell id). At scale, write the result bucketed by ``cell``."""
    schema = T.StructType(
        list(corpus.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                pdf = pdf.copy()
                pdf["cell"] = pd.Series([], dtype="int32")
                yield pdf
                continue
            e = _to_matrix(pdf["embedding"])
            cos = _seq_cosines(e, cents)
            pdf = pdf.copy()
            # np.argmax returns the FIRST max → lowest cell id on ties,
            # mirroring the oracle's ORDER BY cos DESC, cell ASC rank-1
            pdf["cell"] = cos.argmax(axis=1).astype("int32")
            yield pdf

    return corpus.mapInPandas(assign, schema=schema)


def probe_cells(
    queries: DataFrame, cents: np.ndarray, n_probe: int
) -> DataFrame:
    """(query_id, q_embedding) → one row per probed cell: the n_probe
    nearest centroids per query (cos DESC, cell ASC)."""
    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("q_embedding", T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def probe(batches):
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"query_id": [], "q_embedding": [], "cell": []}
                ).astype({"query_id": "int64", "cell": "int32"})
                continue
            e = _to_matrix(pdf["q_embedding"])
            cos = _seq_cosines(e, cents)
            # lexsort: primary -cos, secondary cell index (ascending)
            order = np.lexsort(
                (np.arange(cos.shape[1])[None, :].repeat(len(pdf), 0), -cos),
                axis=1,
            )[:, :n_probe]
            n, p = order.shape
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(np.int64).repeat(p),
                    "q_embedding": [
                        list(map(float, v)) for v in e for _ in range(p)
                    ],
                    "cell": order.astype("int32").ravel(),
                }
            )

    return queries.mapInPandas(probe, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    cents: np.ndarray | None = None,
) -> DataFrame:
    """IVF top-k: assign → probe → equi-join on cell → exact rerank.

    Returns (query_id, vec_id, cosine, rank). The cell join replaces the
    full scan: expected scanned fraction ≈ n_probe / n_cells (uniform
    cells), and the assigned corpus can be persisted bucketed by cell so
    repeated queries never reshuffle it.
    """
    if cents is None:
        cents = seed_centroids(corpus, n_cells)
    assigned = assign_cells(corpus, cents)
    probes = probe_cells(queries, cents, n_probe).withColumnRenamed(
        "q_embedding", "qe"
    )
    cand = assigned.join(probes, "cell").select(
        "query_id", "vec_id", "embedding", F.col("qe").alias("q_embedding")
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"query_id": [], "vec_id": [], "cosine": []}
                ).astype(
                    {
                        "query_id": "int64",
                        "vec_id": "int64",
                        "cosine": "float64",
                    }
                )
                continue
            a = _to_matrix(pdf["embedding"])
            b = _to_matrix(pdf["q_embedding"])
            # exact rerank — in-order fold for oracle parity
            n, d = a.shape
            dots = np.zeros(n)
            an = np.zeros(n)
            bn = np.zeros(n)
            for j in range(d):
                dots += a[:, j] * b[:, j]
                an += a[:, j] * a[:, j]
                bn += b[:, j] * b[:, j]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(dtype=np.int64),
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cosine": dots
                    / np.maximum(np.sqrt(an) * np.sqrt(bn), 1e-300),
                }
            )

    scored = cand.mapInPandas(score, schema=_SCORE_SCHEMA).dropDuplicates(
        ["query_id", "vec_id"]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)
