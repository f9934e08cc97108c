"""Scan-parallelism guard for compute-heavy stages over narrow inputs.

Parquet cannot split a row group, so a table written as one file with
one row group scans as ONE task regardless of cluster size — and every
compute-heavy stage fed by that scan (Arrow matcher batches, signature
kernels, expression-dense projections) runs single-threaded while the
rest of the cluster idles (guide §2.5 "input skew: one huge unsplittable
file → repartition immediately after the read"). Measured on the r7
bench: term_embeddings at sf1.0 ran 6.1 s on 1 of 32 cores; the same
query over a spread input runs the kernel at full parallelism.

``spread_small_input`` repartitions ONLY when the source is narrower
than the session's reducer count (file-count probe — Connect-safe, no
extra job): a corpus already laid out as hundreds of files (the 100-TB
case) is left untouched, so the helper is a no-op exactly where the
extra shuffle would cost something. In-memory DataFrames (no files)
are left alone too — their parallelism already matches their builder.

Call it where per-row compute dominates the repartition's shuffle cost
(Python kernels, expression-dense projections over small rows). Do NOT
call it in front of plain scan→filter→project pipelines or wide-row
shuffles (e.g. lineitem-scale dedups) — there the extra pass costs more
than the parallelism gains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session reducer count when
    its file layout provides fewer splits than that; no-op otherwise."""
    spark = df.sparkSession
    par = target or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file source; leave layout alone
        return df
    if 0 < n_files < par:
        df = df.repartition(par)
    return df
