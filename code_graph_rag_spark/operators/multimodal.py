"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so each Python worker touches a whole batch of payloads at
once. The actual codec step is STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` routes to a deterministic fake decoder so
the Spark-side plumbing — schema, batching, partition sizing — is real and
tested; wiring a real codec is a one-function swap.

At 100 TB: binary payloads dominate partition size, so the operators
repartition by byte-size budget (``maxPartitionBytes`` analogue) rather than
row count before the UDF.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, media_type string, n_bytes long, digest string, "
    "features array<float>"
)


def _fake_decode_features(
    payload: bytes, n_features: int = 8, hash_name: str = "sha1"
) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: a byte-histogram
    projection seeded by the payload digest. Replace with a real codec
    (PIL / torchaudio / pyav) by swapping this function ONLY.
    ``hash_name``: any hashlib algorithm — the driver oracle uses "md5"
    (the only digest DuckDB can replay)."""
    if payload is None:
        return [0.0] * n_features
    digest = hashlib.new(hash_name, payload).digest()
    return [b / 255.0 for b in digest[:n_features]]


def extract_features(
    media: DataFrame,
    n_features: int = 8,
    decode_stub: bool = True,
    hash_name: str = "sha1",
) -> DataFrame:
    """media frame → per-item feature vectors (Arrow-batched)."""
    if not decode_stub:
        raise NotImplementedError(
            "real codecs are not available in this container; "
            "pass decode_stub=True (deterministic fake decoder)"
        )

    def _batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "digest": [
                        hashlib.new(hash_name, p).hexdigest()
                        if p is not None
                        else None
                        for p in payloads
                    ],
                    "features": [
                        _fake_decode_features(p, n_features, hash_name)
                        for p in payloads
                    ],
                }
            )

    return media.mapInPandas(_batch, schema=FEATURE_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Lift media spans out of interleaved documents into a media frame.

    ``media_ref`` becomes the media_id; the payload is null until a fetch
    stage populates it (payload fetch is an IO-bound ``mapInPandas`` at
    scale). Deterministic fake payload = utf-8 of the ref, for tests."""
    spans = documents.select(
        "doc_id", F.explode("spans").alias("span")
    ).filter(F.col("span.kind") == "media")
    return spans.select(
        F.col("span.media_ref").alias("media_id"),
        "doc_id",
        F.lit("image").alias("media_type"),
        F.encode(F.col("span.media_ref"), "utf-8").alias("payload"),
        F.lit(None)
        .cast(
            "struct<width:int,height:int,duration_ms:int,mime:string>"
        )
        .alias("meta"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand duration into sample timestamps
    (pure DataFrame); the decode of each sampled frame is the stubbed UDF."""
    return media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("sample_ms"),
    )
