"""Streaming deduplication — the incremental form of
``operators/dedup.exact_duplicates`` (SURVEY.md §2.9 engine addition;
the reference is batch-only).

Two shapes, both Structured Streaming idioms:

1. ``stream_exact_dedup`` — native ``dropDuplicatesWithinWatermark`` on
   the 128-bit content hash: new documents whose content was already
   seen inside the watermark horizon are dropped before the sink.
   State is bounded by the watermark (Spark evicts hashes older than
   the horizon) — the right semantics for a continuously-ingesting
   corpus where re-posts cluster in time.
2. ``stream_exact_dedup_catchup`` — availableNow + foreachBatch reusing
   the batch keep-min policy against the ALREADY-MATERIALIZED corpus:
   each new batch is anti-joined on content hash against the sink, so
   restarts resume from the checkpoint without reprocessing (the same
   checkpoint-as-cache contract as streaming/mentions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
    watermark: str = "1 hour",
) -> None:
    """Watermarked native dedup: docs with an already-seen md5(text)
    within the watermark horizon are dropped. availableNow trigger —
    one catch-up pass per invocation, stateful across restarts via the
    checkpoint."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    deduped = (
        stream.withColumn("event_time", F.current_timestamp())
        .withColumn("text_hash", F.md5("text"))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("event_time")
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_exact_dedup_catchup(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
) -> None:
    """foreachBatch variant deduping against the MATERIALIZED sink:
    content seen in any earlier batch (even before a restart) never
    re-enters — the streaming twin of exact_duplicates' keep-first
    policy, with the sink itself as the state store (no watermark
    horizon, exact forever-dedup; costs one anti-join per batch against
    the sink, which Iceberg/parquet serve with hash-partition pruning
    at scale)."""
    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = (
            batch_df.withColumn("text_hash", F.md5("text"))
            # keep-min within the batch (exact_duplicates' policy)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("text_hash").orderBy("doc_id")
                ),
            )
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        # probe the sink through Spark itself — os.path only works for
        # driver-local paths; HDFS/S3/Iceberg sinks must use the same
        # reader that will serve the anti-join (r03 review)
        try:
            seen = spark.read.parquet(output_dir).select("text_hash")
        except Exception:  # noqa: BLE001 — sink not created yet
            seen = None
        if seen is not None:
            batch = batch.join(seen, on="text_hash", how="left_anti")
        batch.write.mode("append").parquet(output_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
