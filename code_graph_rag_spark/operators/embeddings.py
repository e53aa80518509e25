"""Entity embeddings + semantic search over graph entities.

The reference embeds function/method source text into a vector store at
ingest time and retrieves by cosine (``graph_updater.py:2051-2181``,
``vector_store.py``). A real encoder is a network model that is not present
in this container, so the ENCODER IS A DETERMINISTIC STUB — a char-trigram
hashing embedder (clearly marked, same policy as the multimodal codec
stub). Everything around it is real and tested: the Arrow-batched
``mapInPandas`` embedding pass over the node table, the (entity_id,
embedding array<float>) sink schema, and the ANN wiring
(``operators/similarity.py`` brute-force / multi-probe LSH) from a text
query back to graph entities.

At 100 TB: the embedding pass is one scan of the entity table (embarrassingly
parallel, no shuffle); the embedded table is written bucketed by LSH bucket
(``with_lsh_bucket``) so repeated queries only touch their probe buckets.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 64

_EMBEDDABLE = ("Function", "Method", "Class", "Module", "Interface", "Enum")


def embed_texts(texts: list[str], dim: int = EMBED_DIM) -> np.ndarray:
    """STUB ENCODER: deterministic char-trigram hashing into ``dim`` buckets,
    L2-normalized. Swap for a real model's batch-encode at deployment; the
    signature (list[str] → (n, dim) float32) is the integration contract."""
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        s = f"^{(t or '').lower()}$"
        for j in range(len(s) - 2):
            h = zlib.crc32(s[j : j + 3].encode("utf-8"))
            out[i, h % dim] += 1.0 + (h >> 16) % 3
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return (out / np.maximum(norms, 1e-300)).astype(np.float32)


_EMB_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_entities(nodes: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Graph entities → (entity_id, label, embedding).

    Embeds the qualified name (dotted path is the identifier text the
    reference embeds alongside source). One scan, Arrow-batched, no shuffle.
    """
    ents = nodes.filter(F.col("label").isin(*_EMBEDDABLE)).select(
        "id", "label", "name"
    )

    def embed(batches):
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {"entity_id": [], "label": [], "embedding": []}
                )
                continue
            vecs = embed_texts(
                [f"{i} {n}" for i, n in zip(pdf["id"], pdf["name"])], dim
            )
            yield pd.DataFrame(
                {
                    "entity_id": pdf["id"],
                    "label": pdf["label"],
                    "embedding": list(map(list, vecs)),
                }
            )

    return ents.mapInPandas(embed, schema=_EMB_SCHEMA)


def reconcile_embeddings(
    nodes: DataFrame, stored: DataFrame | None = None, dim: int = EMBED_DIM
) -> DataFrame:
    """Embedding-sink sync with a content-hash cache (the reference's
    vector-store reconciliation, ``graph_updater.py:2051-2181`` +
    ``embedder.py:226-296``): re-embedding a graph

    * SKIPS entities whose embedded content is unchanged (equi-join on
      (entity_id, content_hash) against the stored table — no encoder call,
      the expensive model pass runs only over the delta);
    * re-embeds new/changed entities;
    * DROPS stored vectors whose entity no longer exists (orphan cleanup —
      the stored-ID reconciliation walk, re-expressed as a semi-join).

    ``stored``: previous output (entity_id, label, content_hash, embedding)
    or None for a first run. Returns the new table with a ``src`` column
    (``cache`` | ``fresh``) for observability. All decisions are joins —
    model-free; the encoder stub only runs inside the fresh branch.
    """
    from code_graph_rag_spark.operators.text import hash60

    current = nodes.filter(F.col("label").isin(*_EMBEDDABLE)).select(
        F.col("id").alias("entity_id"),
        "label",
        "name",
        hash60(F.concat_ws(" ", "id", "name")).alias("content_hash"),
    )
    if stored is None:
        to_embed = current
        kept = None
    else:
        key = ["entity_id", "content_hash"]
        # unchanged ∧ still-existing → reuse the stored vector; vectors of
        # deleted entities drop out of the semi-join (orphan cleanup)
        kept = stored.join(current.select(*key), key, "left_semi").select(
            "entity_id",
            "label",
            "content_hash",
            "embedding",
            F.lit("cache").alias("src"),
        )
        to_embed = current.join(stored.select(*key), key, "left_anti")

    schema = T.StructType(
        [
            T.StructField("entity_id", T.StringType()),
            T.StructField("label", T.StringType()),
            T.StructField("content_hash", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def embed(batches):
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "entity_id": [],
                        "label": [],
                        "content_hash": pd.Series([], dtype="int64"),
                        "embedding": [],
                    }
                )
                continue
            vecs = embed_texts(
                [f"{i} {n}" for i, n in zip(pdf["entity_id"], pdf["name"])],
                dim,
            )
            yield pd.DataFrame(
                {
                    "entity_id": pdf["entity_id"],
                    "label": pdf["label"],
                    "content_hash": pdf["content_hash"],
                    "embedding": list(map(list, vecs)),
                }
            )

    fresh = to_embed.mapInPandas(embed, schema=schema).withColumn(
        "src", F.lit("fresh")
    )
    return fresh if kept is None else kept.unionByName(fresh)


def semantic_search(
    nodes: DataFrame, query: str, k: int = 10, dim: int = EMBED_DIM
) -> DataFrame:
    """Text query → top-k graph entities by embedding cosine.

    The read path of the reference's semantic code search
    (``tools/codebase_query.py`` retrieval leg): embed the query
    driver-side, stream the entity embeddings once, exact top-k.
    """
    from code_graph_rag_spark.operators.similarity import brute_force_topk
    from code_graph_rag_spark.operators.text import hash60

    spark = nodes.sparkSession
    # numeric ids for the ANN operator without a global ordering shuffle:
    # hash60(entity id) — deterministic AND oracle-replayable (md5-based;
    # exact cosine ties DO occur between same-named entities, and the
    # tie-break must replay in the pure-Python twin, so xxhash64 is out)
    emb = embed_entities(nodes, dim).withColumn(
        "vec_id", hash60(F.col("entity_id"))
    )
    qvec = [float(x) for x in embed_texts([query], dim)[0]]
    queries = spark.createDataFrame(
        [(0, qvec)], "query_id long, q_embedding array<double>"
    )
    corpus = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    top = brute_force_topk(corpus, queries, k=k)
    return (
        top.join(emb.select("vec_id", "entity_id", "label"), "vec_id")
        .select(
            "entity_id",
            "label",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
        .orderBy("rank")
    )
