"""Special-stream nomenclature sources — resources too big / too flat
for the ontology flow, appended to database artifacts after the
per-prefix fan-out.

Reference parity: ``cli/database_utils.py:33-42`` (``_iter_ncbigene`` —
streams the 56.7M-row gzipped ``gene_info`` TSV and yields
``(prefix, identifier, name)`` from positional columns) and
``:56-66`` (``_iter_pubchem_compound`` — CID→name TSV in ISO-8859-1),
both unioned into the names artifact by ``_iter_names``
(``cli/database_utils.py:44-54``).

Spark-first shape: the reference streams these row-by-row through the
driver; here each file is a distributed positional-column CSV scan
projected straight to the artifact schema, so the 56.7M-row case is a
narrow map-only plan instead of a single-process gunzip loop.

Scale note: ``.gz`` inputs are NOT splittable — Spark reads a gzipped
file in one task. At the 100-TB tier, land these as uncompressed /
zstd-in-parquet first (one conversion job), or pass a directory of
pre-split shards; the reader below takes either a file or a directory
glob unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: positional columns in NCBI gene_info: 1=GeneID, 2=Symbol
#: (cli/database_utils.py:52 calls ``_iter_ncbigene(1, 2)`` for names)
GENE_INFO_ID_COL = 1
GENE_INFO_NAME_COL = 2


def read_gene_info(
    spark: SparkSession,
    path: str,
    prefix: str = "ncbigene",
    id_col: int = GENE_INFO_ID_COL,
    name_col: int = GENE_INFO_NAME_COL,
) -> DataFrame:
    """(prefix, identifier, name) from an NCBI ``gene_info``-shaped TSV:
    tab-separated positional columns, ``#``-prefixed header line. The
    two column indices are parameters exactly like the reference's
    ``_iter_ncbigene(left, right)`` so the same reader serves e.g.
    (1, 2) names and other column pairs."""
    raw = (
        spark.read.option("sep", "\t")
        .option("comment", "#")  # gene_info's header line starts with '#'
        .option("quote", "")  # gene names may contain quotes; no quoting
        .csv(path)
    )
    return raw.select(
        F.lit(prefix).alias("prefix"),
        F.col(f"_c{id_col}").alias("identifier"),
        F.col(f"_c{name_col}").alias("name"),
    ).where(F.col("identifier").isNotNull() & F.col("name").isNotNull())


def read_cid_name(
    spark: SparkSession, path: str, prefix: str = "pubchem.compound"
) -> DataFrame:
    """(prefix, identifier, name) from a PubChem ``CID-Title``-shaped
    TSV (no header, ISO-8859-1 — reference cli/database_utils.py:58
    opens it with that encoding). One title per CID: the reference's
    sequential read keeps the first occurrence, which has no stable
    distributed equivalent (partition order is a file-split packing
    detail, not input order), so duplicates resolve to the
    lexicographically smallest title — deterministic across runs,
    partitionings and cluster sizes."""
    # whole-line read (sep = an impossible control char, so the CSV
    # reader keeps encoding support but never splits), then split on the
    # FIRST tab only — the reference uses line.split('\t', 1)
    # (cli/database_utils.py) precisely so a title containing tabs is
    # kept whole, not truncated at its first tab (r04 advice)
    raw = (
        spark.read.option("sep", "\u0001")
        .option("encoding", "ISO-8859-1")
        .option("quote", "")
        .csv(path)
    )
    parts = F.split(F.col("_c0"), "\t", 2)
    split2 = raw.select(
        # nullif(''): manual splitting yields EMPTY STRINGS where the
        # CSV reader yielded nulls ('123\t' → ['123','']); an empty
        # title must not survive the null filter — min() would then
        # mask a real title with ''
        F.nullif(parts.getItem(0), F.lit("")).alias("_c0"),
        # try_element_at: null (not an ANSI error) when the line has no tab
        F.nullif(F.try_element_at(parts, F.lit(2)), F.lit("")).alias("_c1"),
    )
    dedup = (
        split2.where(F.col("_c0").isNotNull() & F.col("_c1").isNotNull())
        .groupBy("_c0")
        .agg(F.min("_c1").alias("_c1"))
    )
    return dedup.select(
        F.lit(prefix).alias("prefix"),
        F.col("_c0").alias("identifier"),
        F.col("_c1").alias("name"),
    )


def names_with_special_streams(
    names: DataFrame, specials: list[DataFrame]
) -> DataFrame:
    """The reference's ``_iter_names`` composition: the ontology-derived
    names artifact followed by each special stream, schema-aligned.
    Pure unionByName — no shuffle; each input keeps its own scan
    parallelism."""
    out = names.select("prefix", "identifier", "name")
    for s in specials:
        out = out.unionByName(s.select("prefix", "identifier", "name"))
    return out
