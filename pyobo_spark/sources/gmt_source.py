"""GMT (Gene Matrix Transposed) gene-set reader — reference
``sources/gmt_utils.py``: each line is ``name<TAB>info<TAB>gene...``;
the WikiPathways dialect packs ``info%WikiPathways_version%id%species``
into the first field.

Spark-first: GMT is line-oriented, so ``spark.read.text`` distributes a
multi-GB dump natively; the split/parse is pure JVM column algebra (no
Python). Gene sets come back as an ``array<string>`` column — explode
for the membership long table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_gmt(spark: SparkSession, path: str) -> DataFrame:
    """(name, info, genes: array<string>) — one row per gene set
    (parse_gmt_file / _process_line semantics: tab-split, whitespace
    trimmed, duplicate genes deduped)."""
    lines = spark.read.text(path).where(F.trim("value") != "")
    parts = F.transform(F.split("value", "\t"), lambda p: F.trim(p))
    # try_element_at: ANSI mode is on by default in Spark 4 — a
    # malformed name-only line must yield a null info, not fail the job.
    # Empty gene tokens from trailing/double tabs are filtered like the
    # reference's line.strip() pre-split.
    return lines.select(
        F.try_element_at(parts, F.lit(1)).alias("name"),
        F.try_element_at(parts, F.lit(2)).alias("info"),
        F.array_distinct(
            F.filter(
                F.slice(parts, 3, 1_000_000), lambda g: g != ""
            )
        ).alias("genes"),
    )


def read_wikipathways_gmt(spark: SparkSession, path: str) -> DataFrame:
    """(identifier, version, revision, info, species, genes) — the
    WikiPathways dialect (parse_wikipathways_gmt): first field is
    ``info%WikiPathways_<version>%<identifier>%<species>``; revision is
    no longer present in current files and comes back empty."""
    base = read_gmt(spark, path)
    meta = F.split("name", "%")
    return base.select(
        F.try_element_at(meta, F.lit(3)).alias("identifier"),
        F.try_element_at(
            F.split(F.try_element_at(meta, F.lit(2)), "_"), F.lit(2)
        ).alias("version"),
        F.lit("").alias("revision"),
        F.try_element_at(meta, F.lit(1)).alias("info"),
        F.try_element_at(meta, F.lit(4)).alias("species"),
        "genes",
    )


def gene_set_members(gmt: DataFrame, prefix: str = "ncbigene") -> DataFrame:
    """Explode sets into the engine's membership long table:
    (set_name, gene_prefix, gene_id)."""
    return gmt.select(
        F.col("name").alias("set_name"),
        F.lit(prefix).alias("gene_prefix"),
        F.explode("genes").alias("gene_id"),
    )
