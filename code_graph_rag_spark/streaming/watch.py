"""Watch mode: Structured Streaming over a documents directory.

The reference's ``realtime_updater.py:40-60`` watches the filesystem with
debounce + max-wait, then reruns the incremental sync. The Spark-native
shape is a file-source stream feeding ``foreachBatch``, where each
micro-batch runs the SAME batch incremental pipeline (``incremental_build``)
— debounce ≈ the processing-time trigger; ordering is re-established per
batch so no watermark is needed (the reference has no late-data semantics).

Each micro-batch carries new/updated document rows; state (doc hashes +
mentions) lives in the StageStore, so the stream is a thin driver around
the batch engine — exactly one code path for batch and streaming
(incremental ≡ full rebuild continues to hold per batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from code_graph_rag_spark.incremental import StageStore, incremental_build
from code_graph_rag_spark.schema import DEFAULT_GROUPS, DOCUMENTS_SCHEMA


def watch_documents(
    spark: SparkSession,
    input_dir: str,
    store: StageStore,
    trigger_seconds: int = 10,
    on_batch=None,
    groups: tuple[str, ...] = DEFAULT_GROUPS,
) -> StreamingQuery:
    """Stream parquet document drops from ``input_dir``; every micro-batch
    merges the new/changed docs into the store and rebuilds the graph
    incrementally. Returns the running StreamingQuery (caller stops it).

    ``on_batch(graph, stats, epoch_id)`` is invoked after each batch (for
    sinks/metrics); by default the nodes/edges stage tables in the store are
    the sink.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # a micro-batch is a partial snapshot: merge batch docs over the
        # previously-known full doc set (upsert by doc_id)
        known = None
        if store.has_stage("documents"):
            known = store.read_stage(spark, "documents")
        if known is not None:
            full = known.join(
                batch_df.select("doc_id").distinct(), "doc_id", "left_anti"
            ).unionByName(batch_df)
        else:
            full = batch_df
        store.write_stage("documents", full, epoch=epoch_id)
        full = store.read_stage(spark, "documents")
        graph, stats = incremental_build(spark, full, store, groups=groups)
        if on_batch is not None:
            on_batch(graph, stats, epoch_id)

    return (
        stream.writeStream.outputMode("append")
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .foreachBatch(_process)
        .start()
    )
