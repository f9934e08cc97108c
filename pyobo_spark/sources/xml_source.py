"""Generic record-oriented XML nomenclature source — third declarative
converter exemplar beside :mod:`csv_source` and :mod:`json_source`.

Reference parity: the XML-backed plugins parse the whole document with
lxml on the driver and iterate record elements into ``Term`` streams —
e.g. MeSH ``DescriptorRecord`` (``sources/mesh.py:72-110``), DrugBank,
UniMod. One declarative :class:`XmlSpec` replaces each bespoke plugin.

Spark-first: the document is SPLIT INTO RECORDS BY THE DATA SOURCE —
``spark.read.text`` with ``lineSep=</RecordTag>`` yields one record
fragment per row, so a multi-GB XML dump distributes across executors
without any driver parse (the same chunk-split idea as the OBO
stanza-parallel reader, obo_reader.py). Per-record field extraction
runs ``xml.etree`` inside an Arrow-batched ``mapInPandas`` — linear,
no per-row Python UDF calls.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class XmlSpec:
    prefix: str                      # ontology prefix to emit
    record_tag: str                  # element delimiting one record
    identifier: str                  # relative xpath to the local id
    name: str | None = None          # relative xpath to the label
    definition: str | None = None
    synonyms: str | None = None      # xpath matching MULTIPLE elements
    parent: str | None = None        # xpath to parent local-id
    extras: dict[str, str] = field(default_factory=dict)  # pred → xpath


_ROW_SCHEMA = T.StructType(
    [
        T.StructField("identifier", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("definition", T.StringType()),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
        T.StructField("parent", T.StringType()),
        T.StructField("extras", T.MapType(T.StringType(), T.StringType())),
    ]
)


def iter_fragment_elements(fragments, record_tag: str):
    """lineSep-split record fragments → parsed Elements. The shared
    scaffolding for every record-split XML source (this module and
    mesh_source): boundary-aware open match (`<Record` must not match
    `<RecordSet`), re-append the close tag the lineSep consumed, strip
    any prolog/leading siblings, skip malformed tail fragments."""
    import re
    import xml.etree.ElementTree as ET

    open_re = re.compile(f"<{re.escape(record_tag)}(?=[\\s/>])")
    close_tag = f"</{record_tag}>"
    for frag in fragments:
        m = open_re.search(frag)
        if m is None:
            continue  # header/footer fragment with no record
        try:
            yield ET.fromstring(frag[m.start():] + close_tag)
        except ET.ParseError:
            continue  # malformed tail fragment


def _parse_records(spec: XmlSpec):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for el in iter_fragment_elements(pdf["value"], spec.record_tag):
                ident = el.findtext(spec.identifier)
                if ident is None:
                    continue
                rows.append(
                    {
                        "identifier": ident.strip(),
                        "name": (
                            el.findtext(spec.name).strip()
                            if spec.name and el.findtext(spec.name)
                            else None
                        ),
                        "definition": (
                            el.findtext(spec.definition).strip()
                            if spec.definition
                            and el.findtext(spec.definition)
                            else None
                        ),
                        "synonyms": (
                            [
                                e.text.strip()
                                for e in el.findall(spec.synonyms)
                                if e.text and e.text.strip()
                            ]
                            if spec.synonyms
                            else []
                        ),
                        "parent": (
                            el.findtext(spec.parent).strip()
                            if spec.parent and el.findtext(spec.parent)
                            else None
                        ),
                        "extras": {
                            pred: el.findtext(xp).strip()
                            for pred, xp in spec.extras.items()
                            if el.findtext(xp)
                        },
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "identifier", "name", "definition", "synonyms",
                    "parent", "extras",
                ],
            )

    return run


def read_nomenclature_xml(
    spark: SparkSession, path: str, spec: XmlSpec
) -> dict[str, DataFrame]:
    """Record-split XML → {terms, synonyms, parents, properties}."""
    raw = spark.read.option(
        "lineSep", f"</{spec.record_tag}>"
    ).text(path)
    recs = raw.mapInPandas(_parse_records(spec), schema=_ROW_SCHEMA)

    terms = recs.select(
        F.lit(spec.prefix).alias("prefix"),
        "identifier",
        "name",
        "definition",
        F.lit(None).cast("string").alias("namespace"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    )
    out: dict[str, DataFrame] = {"terms": terms}
    if spec.synonyms:
        out["synonyms"] = recs.select(
            F.lit(spec.prefix).alias("prefix"),
            "identifier",
            F.explode("synonyms").alias("text"),
            F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
            F.lit(None).cast("string").alias("type"),
            F.lit(None).cast("array<string>").alias("provenance"),
            F.lit(None).cast("string").alias("language"),
        )
    if spec.parent:
        out["parents"] = recs.where(F.col("parent").isNotNull()).select(
            F.lit(spec.prefix).alias("child_prefix"),
            F.col("identifier").alias("child"),
            F.lit(spec.prefix).alias("parent_prefix"),
            F.col("parent").alias("parent"),
        )
    if spec.extras:
        out["properties"] = recs.select(
            F.lit(spec.prefix).alias("prefix"), "identifier",
            F.explode("extras").alias("predicate_curie", "value"),
        ).select(
            F.concat_ws(":", "prefix", "identifier").alias("source_curie"),
            "predicate_curie",
            "value",
            F.lit("xsd:string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
        )
    return out
