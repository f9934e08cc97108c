"""Incremental (streaming) mention detection — SURVEY.md §2.9.

The reference is batch-only (file caches as resumability). The Spark-
native incremental path is Structured Streaming with availableNow=True:
each trigger processes the files that arrived since the last checkpoint,
runs the SAME batch grounding code via foreachBatch, and commits the
sink + checkpoint atomically — restart resumes exactly where it left
off. At 100 TB this is the 'catch-up on new corpus partitions' job; the
checkpoint directory plays the role of the reference's per-artifact
`path.is_file()` cache checks (struct.py:1354, getters.py:166-176).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grounding import matcher


def stream_mention_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    matcher_broadcast,
    checkpoint_dir: str,
    output_dir: str,
    fold: bool = True,
) -> None:
    """Run an availableNow streaming pass: parquet files in input_dir →
    per-(doc, curie) mention counts appended to output_dir parquet.

    foreachBatch reuses the exact batch operator (match_mention_counts),
    so streaming and batch semantics cannot diverge."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spans = batch_df.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.lit(0).alias("span_idx"),
            "text",
        )
        out = matcher.match_mention_counts(spans, matcher_broadcast, fold=fold)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            output_dir
        )

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


def stream_windowed_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    output_dir: str,
    window_minutes: int = 60,
    watermark_minutes: int = 120,
) -> None:
    """Event-time windowed aggregation with a watermark: late events
    beyond the watermark are dropped; windows emit (append mode) once the
    watermark passes their end. availableNow → processes the backlog and
    terminates; the checkpoint carries watermark + window state across
    runs, so a later invocation continues with the same late-data
    semantics (the engine's stateful-streaming path)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(F.window("ts", f"{window_minutes} minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_session_counts(
    spark,
    in_dir: str,
    schema,
    checkpoint: str,
    out_dir: str,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> None:
    """Streaming gap-based sessionization: readStream → withWatermark →
    groupBy(user_id, session_window) → append sink, availableNow.

    The same session_window expression as the batch operator
    (operators/events.py::sessionize_native) — watermark bounds state:
    sessions whose end is older than the watermark are finalized and
    emitted; state never grows past the active-session frontier. On a
    real cluster this is the resumable form of session analytics over
    the event stream."""
    from pyspark.sql import functions as F

    events = spark.readStream.schema(schema).parquet(in_dir)
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("window_start"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
