"""Declarative JSON-lines nomenclature source — the second exemplar of
the reference's per-source plugin family (plugins.py entry points; 73
bespoke converters in src/pyobo/sources/, many of which parse JSON
payloads, e.g. hgnc.py/rhea). Same contract as csv_source: a small spec
maps source fields onto the engine's long tables; everything else is
the shared machinery.

JSON-specific surface the CSV exemplar can't show: nested arrays
(synonyms as a list field → explode) and schema-tolerant optional
fields (spark.read.json drops absent optional fields from inferred
schemas — probe before selecting)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class JsonSpec:
    prefix: str
    identifier: str                      # field holding the local id
    name: str | None = None
    definition: str | None = None
    synonyms: str | None = None          # ARRAY field of synonym strings
    parent: str | None = None            # local-id field (same prefix)
    xref: str | None = None              # CURIE field
    extras: dict[str, str] = field(default_factory=dict)  # pred → field


def _has(df: DataFrame, col: str | None) -> bool:
    return col is not None and col in df.columns


def read_nomenclature_jsonl(
    spark: SparkSession, path: str, spec: JsonSpec
) -> dict[str, DataFrame]:
    """JSON-lines → {terms, synonyms, xrefs, parents, properties}."""
    df = spark.read.json(path)
    ident = F.col(spec.identifier).cast("string").alias("identifier")

    out: dict[str, DataFrame] = {}
    out["terms"] = df.select(
        F.lit(spec.prefix).alias("prefix"),
        ident,
        (F.col(spec.name).cast("string") if _has(df, spec.name)
         else F.lit(None).cast("string")).alias("name"),
        (F.col(spec.definition).cast("string") if _has(df, spec.definition)
         else F.lit(None).cast("string")).alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    )
    if _has(df, spec.synonyms):
        out["synonyms"] = (
            df.where(F.col(spec.synonyms).isNotNull())
            .select(ident, F.explode(spec.synonyms).alias("text"))
            .select(
                F.lit(spec.prefix).alias("prefix"),
                "identifier",
                F.col("text").cast("string").alias("text"),
                F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
                F.lit(None).cast("string").alias("type"),
                F.lit(None).cast("array<string>").alias("provenance"),
                F.lit(None).cast("string").alias("language"),
            )
        )
    if _has(df, spec.parent):
        out["parents"] = (
            df.where(F.col(spec.parent).isNotNull())
            .select(
                F.lit(spec.prefix).alias("child_prefix"),
                ident.alias("child"),
                F.lit(spec.prefix).alias("parent_prefix"),
                F.col(spec.parent).cast("string").alias("parent"),
            )
        )
    if _has(df, spec.xref):
        xref = F.col(spec.xref).cast("string")
        out["xrefs"] = (
            # require a real CURIE — a colon-less value would yield a
            # NULL target_id against a non-nullable schema contract
            df.where(xref.isNotNull() & xref.contains(":"))
            .select(
                F.lit(spec.prefix).alias("prefix"),
                ident,
                F.lit("oboInOwl:hasDbXref").alias("predicate"),
                # lowercase like obo_reader, or cross-source joins on
                # target_prefix treat MESH and mesh as two namespaces
                F.lower(F.split(xref, ":", 2)[0]).alias("target_prefix"),
                F.split(xref, ":", 2)[1].alias("target_id"),
                F.lit(None).cast("string").alias("provenance"),
            )
        )
    props = None
    for pred, col in spec.extras.items():
        if col not in df.columns:
            continue
        leg = df.where(F.col(col).isNotNull()).select(
            F.concat(F.lit(spec.prefix + ":"), ident).alias("source_curie"),
            F.lit(pred).alias("predicate_curie"),
            F.col(col).cast("string").alias("value"),
            F.lit("xsd:string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
        )
        props = leg if props is None else props.unionByName(leg)
    if props is not None:
        out["properties"] = props
    return out
