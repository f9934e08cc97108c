"""Structured Streaming mention stage: availableNow incremental runs with
checkpoint/resume — new files processed, old files not reprocessed."""

from __future__ import annotations

from pyspark.sql import types as T

from pyobo_spark import queries as Q
from pyobo_spark.grounding.dictionary import build_matcher
from pyobo_spark.streaming.mentions import stream_mention_counts

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_streaming_incremental_resume(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    bc = spark.sparkContext.broadcast(build_matcher(Q.MENTION_DICT))

    spark.createDataFrame(
        [(1, "spark join spark"), (2, "no matches here")], SCHEMA
    ).write.mode("append").parquet(in_dir)
    stream_mention_counts(spark, in_dir, SCHEMA, bc, ckpt, out_dir)

    first = spark.read.parquet(out_dir)
    rows = {(r["doc_id"], r["curie"]): r["n_mentions"] for r in first.collect()}
    assert rows == {("1", "fixo:0000001"): 2, ("1", "fixo:0000002"): 1}

    # second batch of files: only the NEW docs are processed on resume
    spark.createDataFrame([(3, "filter filter")], SCHEMA).write.mode(
        "append"
    ).parquet(in_dir)
    stream_mention_counts(spark, in_dir, SCHEMA, bc, ckpt, out_dir)

    second = spark.read.parquet(out_dir)
    rows2 = {(r["doc_id"], r["curie"]): r["n_mentions"] for r in second.collect()}
    assert rows2 == {
        ("1", "fixo:0000001"): 2,
        ("1", "fixo:0000002"): 1,
        ("3", "fixo:0000003"): 2,
    }
    # doc 1 appears exactly once → no reprocessing happened
    assert second.where("doc_id = '1' and curie = 'fixo:0000001'").count() == 1


def test_streaming_windowed_watermark(spark, tmp_path):
    """Windowed agg with watermark: closed windows emit in append mode;
    a late event behind the watermark is dropped on the next run."""
    import datetime as dt

    from pyobo_spark.streaming.mentions import stream_windowed_event_counts

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    in_dir = str(tmp_path / "ein")
    out_dir = str(tmp_path / "eout")
    ckpt = str(tmp_path / "eckpt")

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (t0, "click"),
        (t0 + dt.timedelta(minutes=5), "click"),
        # an event far ahead advances the watermark past hour-0's window
        (t0 + dt.timedelta(hours=10), "view"),
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(in_dir)
    stream_windowed_event_counts(spark, in_dir, schema, ckpt, out_dir)

    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got.get(("2024-01-01 00:00:00", "click")) == 2  # window closed
    assert ("2024-01-01 10:00:00", "view") not in got  # still open

    # late event behind the watermark → dropped on the incremental run
    spark.createDataFrame([(t0, "click")], schema).write.mode("append").parquet(
        in_dir
    )
    stream_windowed_event_counts(spark, in_dir, schema, ckpt, out_dir)
    after = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    assert after.get(("2024-01-01 00:00:00", "click")) == 2  # unchanged
