"""Bucketed (co-located) joins — the shuffle-elimination strategy for
repeated corpus⋈corpus joins at 100 TB.

Every repeated join in the engine keys on the same columns (doc_id on
the corpus plane; curie on the KG plane). Writing both sides bucketed by
that key with the same bucket count lets Spark plan a SortMergeJoin with
ZERO Exchange — each task reads matching buckets from both sides. On a
1000-executor cluster this converts the biggest recurring shuffle
(corpus ⋈ mentions, mentions ⋈ components) into a scan-local join; the
bucket count is chosen once at write time (rule of thumb: total data /
256 MB, rounded to a power of two).

Spark-first notes:
- bucketing requires the table catalog (`saveAsTable`), not bare parquet
  paths — bucket metadata lives in the catalog;
- both sides must have the SAME bucket count (or a divisor — Spark 3.1+
  bucket coalescing) and the join keys must equal the bucket keys;
- `spark.sql.sources.bucketing.enabled` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets means the co-located join needs no per-task
    sort either — the plan is scan → zip-merge."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With matching bucket specs Catalyst plans SortMergeJoin WITHOUT an
    Exchange on either side (guarded by test_plans.py) — the join cost
    is pure scan, the shuffle that would dominate at corpus scale is
    gone."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
