"""Event-time windowed aggregations + explicit skew salting.

The reference has no event-time semantics (SURVEY.md §2.9); these cover
the engine's stream-shaped workloads over the `events` table and the
north rule's 'salted groupBy + AQE skew hints' clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Per-(window, event_type) counts + value sums over tumbling
    event-time windows. Batch form of the streaming windowed agg; the
    same expression runs under readStream + withWatermark."""
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, window_minutes: int = 60, slide_minutes: int = 30
) -> DataFrame:
    """Sliding event-time windows: every event lands in
    window/slide overlapping windows (F.window with slideDuration)."""
    w = F.window("ts", f"{window_minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"), "event_type", "n_events"
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds gap_minutes. Classic lag + running-sum
    window composition; one shuffle on user_id."""
    from pyspark.sql import Window as W

    # event_id as tiebreaker → deterministic under duplicate timestamps
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap must be timezone-free AND microsecond-exact: ts is
    # TIMESTAMP_NTZ in parquet, and an NTZ→LTZ cast would interpret the
    # value in the *session* timezone (wrong sessions across DST in a
    # non-UTC driver session — CORRECTNESS_r01 failure). timestampdiff
    # on the NTZ values directly is tz-free, and MICROSECOND keeps the
    # sub-second precision present in the data (a seconds-truncating
    # cast misclassified gaps within 1s of the threshold).
    prev_ts = F.lag("ts").over(w_user)
    with_prev = events.withColumn("_prev_ts", prev_ts)
    gap_us = F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
    new_sess = F.when(
        F.col("_prev_ts").isNull()
        | (gap_us > gap_minutes * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess_id = F.sum(new_sess).over(
        W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    tagged = with_prev.withColumn("session_seq", sess_id).drop("_prev_ts")
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def salted_counts(
    df: DataFrame, key: str, n_salts: int = 16, salt_source: str | None = None
) -> DataFrame:
    """Two-phase salted aggregation for skewed keys (north rule: GO/
    CHEBI/NCBITaxon-shaped prefix skew): phase 1 groups on (key, salt)
    so a hot key spreads over n_salts reducers; phase 2 merges the
    partials — its input is ≤ n_salts rows per key, never hot.

    salt_source: a column to derive the salt from (deterministic,
    e.g. a row id); defaults to a hash of all columns via
    spark_partition_id + monotonic id — here we use pmod(hash(source)).
    Result is EXACTLY groupBy(key).count() — salting is invisible in the
    output, which is what the oracle checks."""
    salt_col = (
        F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
        if salt_source
        else F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("n_rows"))


def sessionize_native(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE session_window operator —
    the idiomatic form of `sessionize` (same semantics: a session closes
    after gap_minutes of inactivity; works in batch and, with a
    watermark, in Structured Streaming). One shuffle on (user_id,
    session window); Catalyst merges overlapping windows in the
    aggregation, no lag/running-sum composition needed.

    Returns (user_id, n_events, session_start, session_end) where
    session_start/end are min/max EVENT times (not the padded window
    end, which extends gap_minutes past the last event)."""
    w = F.session_window("ts", f"{gap_minutes} minutes")
    return (
        events.groupBy("user_id", w.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .drop("win")
    )
