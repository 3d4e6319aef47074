"""Structured Streaming ingestion (SURVEY §2.10).

The reference has no streaming — its incrementality is checkpoint-and-skip
(src/pipeline.py:31-33). Here the same extraction pipeline runs as a
Structured Streaming flow: a file source over the interleaved-document table
feeds micro-batches into foreachBatch, which reuses the *batch* operators
(chunk -> extract -> link -> triples) unchanged and appends to the edges
sink. Spark's streaming checkpoint gives exactly-once file-level resume —
the streaming analogue of the CheckpointManager anti-join.

Also provides a watermarked windowed aggregation over the driver `events`
table shape (the standard late-data pattern) to cover the Structured
Streaming operator surface.
"""

from __future__ import annotations

import os
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wbkg.schemas import DOCUMENTS_INTERLEAVED


def stream_extract_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    entity_dict_df: DataFrame,
    pattern_rows: List[Tuple[str, str, str]],
):
    """readStream(files) -> foreachBatch(batch pipeline) -> parquet edges.

    Returns the StreamingQuery (availableNow trigger: drains all current
    input then stops — use .awaitTermination())."""
    from wbkg.chunker import chunk_documents
    from wbkg.extract import extract_acronyms, extract_mentions
    from wbkg.link import link_mentions
    from wbkg.materialize import entity_triples, union_distinct
    from wbkg.canonicalize import apply_canonicalization, canonical_map

    stream = (
        spark.readStream.schema(DOCUMENTS_INTERLEAVED)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        chunks = chunk_documents(batch_df).persist()
        acronyms = extract_acronyms(chunks).persist()
        mentions = extract_mentions(chunks, acronyms, pattern_rows).persist()
        linked = link_mentions(mentions, entity_dict_df).persist()
        cmap = canonical_map(entity_dict_df, acronyms, linked)
        linked_c = apply_canonicalization(linked, cmap)
        edges = union_distinct(entity_triples(linked_c))
        edges.write.mode("append").parquet(output_dir)
        for df in (chunks, acronyms, mentions, linked):
            df.unpersist()

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame, watermark: str = "10 minutes"):
    """Watermarked sliding-window aggregation (late-data handling) — the
    Structured Streaming stateful-op surface. events_stream must carry
    (ts timestamp, event_type string, value double)."""
    return (
        # event-time watermarks need TIMESTAMP (parquet may carry NTZ)
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("total_value"))
    )
