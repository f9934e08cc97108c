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
