"""Generic CSV/TSV nomenclature source — the exemplar for the
reference's 54 bespoke converter plugins (src/pyobo/sources/, e.g. the
HGNC JSON converter at sources/hgnc/hgnc.py:50-80): each plugin maps a
tabular download to Term streams. Here one declarative ColumnSpec maps a
spark.read.csv DataFrame to the engine's long tables — new nomenclatures
are a spec, not code.

Spark-first: the CSV scans distribute natively; synonym columns with
in-cell separators explode to rows; everything stays in DataFrame ops.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class ColumnSpec:
    prefix: str                      # ontology prefix to emit
    identifier: str                  # column holding the local identifier
    name: str | None = None          # column holding the label
    definition: str | None = None
    synonyms: str | None = None      # column with sep-joined synonyms
    synonyms_sep: str = "|"
    xref: str | None = None          # column with target CURIEs
    parent: str | None = None        # column with parent identifier
    obsolete: str | None = None      # boolean-ish column
    extras: dict[str, str] = field(default_factory=dict)  # prop → column


def read_nomenclature_csv(
    spark: SparkSession, path: str, spec: ColumnSpec, **reader_options
) -> dict[str, DataFrame]:
    """CSV/TSV → {terms, synonyms, xrefs, parents, properties} tables."""
    opts = {"header": "true", **{k: str(v) for k, v in reader_options.items()}}
    df = spark.read.options(**opts).csv(path)
    ident = F.col(spec.identifier).cast("string").alias("identifier")

    terms = df.select(
        F.lit(spec.prefix).alias("prefix"),
        ident,
        (F.col(spec.name).cast("string") if spec.name else F.lit(None).cast(
            "string")).alias("name"),
        (F.col(spec.definition).cast("string") if spec.definition
         else F.lit(None).cast("string")).alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        (F.lower(F.col(spec.obsolete).cast("string")).isin("true", "1", "yes")
         if spec.obsolete else F.lit(False)).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    ).where(F.col("identifier").isNotNull())

    out: dict[str, DataFrame] = {"terms": terms}

    if spec.synonyms:
        out["synonyms"] = (
            df.where(F.col(spec.synonyms).isNotNull())
            .select(
                F.lit(spec.prefix).alias("prefix"),
                ident,
                F.explode(
                    # F.split takes a REGEX — escape literal separators
                    F.split(F.col(spec.synonyms), re.escape(spec.synonyms_sep))
                ).alias("text"),
                F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
                F.lit(None).cast("string").alias("type"),
                F.lit(None).cast("array<string>").alias("provenance"),
                F.lit(None).cast("string").alias("language"),
            )
            .where(F.trim("text") != "")
        )
    if spec.xref:
        out["xrefs"] = (
            df.where(F.col(spec.xref).isNotNull())
            .select(
                F.lit(spec.prefix).alias("prefix"),
                ident,
                F.lit("oboInOwl:hasDbXref").alias("predicate"),
                F.split(F.col(spec.xref), ":", 2)[0].alias("target_prefix"),
                F.split(F.col(spec.xref), ":", 2)[1].alias("target_id"),
                F.lit(None).cast("string").alias("provenance"),
            )
        )
    if spec.parent:
        out["parents"] = (
            df.where(F.col(spec.parent).isNotNull())
            .select(
                F.lit(spec.prefix).alias("child_prefix"),
                ident.alias("child"),
                F.lit(spec.prefix).alias("parent_prefix"),
                F.col(spec.parent).cast("string").alias("parent"),
            )
        )
    if spec.extras:
        props = None
        for pred, col in spec.extras.items():
            leg = df.where(F.col(col).isNotNull()).select(
                F.concat(F.lit(spec.prefix + ":"), ident).alias("source_curie"),
                F.lit(pred).alias("predicate_curie"),
                F.col(col).cast("string").alias("value"),
                F.lit("xsd:string").alias("datatype"),
                F.lit(None).cast("string").alias("language"),
            )
            props = leg if props is None else props.unionByName(leg)
        out["properties"] = props
    return out
