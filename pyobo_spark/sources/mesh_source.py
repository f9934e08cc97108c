"""MeSH-style multi-file-join nomenclature source — sixth converter
exemplar, covering the last untested reference plugin idiom: an ontology
assembled by JOINING several files (descriptors + supplemental records)
plus a DERIVED-KEY SELF-JOIN (tree numbers → parents).

Reference parity (``sources/mesh.py``):

- two XML dumps parsed separately — descriptors (``DescriptorUI`` /
  ``DescriptorName/String``) and supplemental records
  (``SupplementalRecordUI`` / ``SupplementalRecordName/String``) — then
  combined into one term stream (``get_terms``, mesh.py:116-170);
- hierarchy is NOT stored as parent pointers: each descriptor carries
  tree numbers (``A01.236.249``); the parent is whichever descriptor
  owns the tree number one segment shorter (``A01.236``), resolved via
  a tree-number → descriptor map (``get_descriptor_records``,
  mesh.py:216-253). Dotless tree numbers parent to a synthetic
  per-letter root term (``TREE_HEADERS``, mesh.py:41-66); unresolved
  parent tree numbers are logged and skipped;
- supplemental records have no tree numbers and all parent to one
  synthetic ``supplemental-record`` term (mesh.py:35-37, 165-168);
- synonyms = concept names ∪ concept term strings, minus the record's
  own name (mesh.py:128-133); the definition is the preferred concept's
  scope note (``get_scope_note``, mesh.py:257-268);
- registry numbers classify into xrefs (``_get_xrefs``,
  mesh.py:305-329): ``txid…`` → NCBITaxon, ``EC …`` → eccode with the
  trailing dot/dash strip (standardize_ec, identifier_utils/api.py:
  283-288), 7-2-1-digit CAS pattern → cas, 10-alnum → unii; ``0`` and
  unhandled formats are dropped.

Spark-first shape: the reference parses both XML dumps fully on the
driver and resolves parents through an in-memory dict. Here each dump
is record-split by the data source (``lineSep=</RecordTag>`` — one
record fragment per row, so a multi-GB dump distributes across
executors, same as :mod:`xml_source`), field extraction is an
Arrow-batched ``mapInPandas``, and the tree-number parent resolution is
a distributed self-join: explode (identifier, tree_number), derive the
parent tree number JVM-side, join back on the exploded map.

.. note:: splittability — NLM publishes the dumps gzip-compressed
   (the reference downloads ``desc{version}.gz``), and plain ``.gz``
   is NOT splittable in ``spark.read.text``: a compressed dump parses
   in a single task. To get the distributed scan described above,
   decompress first (or recompress as bgzip/plain XML); the record
   splitting then parallelizes across executors as documented. At MeSH's
real size (~30k descriptors) Catalyst broadcasts the map; the same plan
holds if the taxonomy were 1000× bigger.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PREFIX = "mesh"

#: tree header letters → synthetic root-term names (mesh.py:41-60)
TREE_HEADER_TO_NAME = {
    "A": "Anatomy",
    "B": "Organisms",
    "C": "Diseases",
    "D": "Chemicals and Drugs",
    "E": "Analytical, Diagnostic and Therapeutic Techniques, and Equipment",
    "F": "Psychiatry and Psychology",
    "G": "Phenomena and Processes",
    "H": "Disciplines and Occupations",
    "I": "Anthropology, Education, Sociology, and Social Phenomena",
    "J": "Technology, Industry, and Agriculture",
    "K": "Humanities",
    "L": "Information Science",
    "M": "Named Groups",
    "N": "Health Care",
    "V": "Publication Characteristics",
    "Z": "Geographicals",
}

SUPPLEMENT_PARENT_ID = "supplemental-record"

_CAS_RE = re.compile(r"^\d{1,7}\-\d{2}\-\d$")
_UNII_RE = re.compile(r"[0-9A-Za-z]{10}$")

_REC_SCHEMA = T.StructType(
    [
        T.StructField("identifier", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("scope_note", T.StringType()),
        T.StructField("tree_numbers", T.ArrayType(T.StringType())),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
        T.StructField("registry_numbers", T.ArrayType(T.StringType())),
    ]
)


def _parse_mesh_records(record_tag: str, id_key: str, name_key: str):
    """mapInPandas kernel: one MeSH record fragment per input row →
    one flat record. Shared by the descriptor and supplemental dumps
    (the reference calls get_descriptor_records with per-file keys).
    Fragment→Element scaffolding shared with xml_source."""
    from .xml_source import iter_fragment_elements

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for el in iter_fragment_elements(pdf["value"], record_tag):
                ident = el.findtext(id_key)
                if not ident:
                    continue
                name = el.findtext(name_key)
                name = name.strip() if name else None
                synonyms: set[str] = set()
                registry: set[str] = set()
                scope_note = None
                for concept in el.findall("ConceptList/Concept"):
                    cname = concept.findtext("ConceptName/String")
                    if cname:
                        synonyms.add(cname.strip())
                    for term in concept.findall("TermList/Term/String"):
                        if term.text:
                            synonyms.add(term.text.strip())
                    # preferred concept's scope note wins (first found,
                    # mesh.py get_scope_note takes the first present)
                    if scope_note is None:
                        sn = concept.findtext("ScopeNote")
                        if sn:
                            scope_note = sn.replace("\\n", "\n").strip()
                    rn = concept.findtext("RegistryNumber")
                    if rn:
                        registry.add(rn.strip())
                    for rrn in concept.findall(
                        "RelatedRegistryNumberList/RegistryNumber"
                    ):
                        if rrn.text:
                            registry.add(rrn.text.strip())
                rows.append(
                    {
                        "identifier": ident.strip(),
                        "name": name,
                        "scope_note": scope_note,
                        "tree_numbers": sorted(
                            {
                                x.text.strip()
                                for x in el.findall(
                                    "TreeNumberList/TreeNumber"
                                )
                                if x.text
                            }
                        ),
                        "synonyms": sorted(
                            s for s in synonyms if s and s != (name or "")
                        ),
                        "registry_numbers": sorted(registry),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _REC_SCHEMA])

    return run


def _read_records(
    spark: SparkSession, path: str, record_tag: str, id_key: str, name_key: str
) -> DataFrame:
    raw = spark.read.option("lineSep", f"</{record_tag}>").text(path)
    return raw.mapInPandas(
        _parse_mesh_records(record_tag, id_key, name_key), schema=_REC_SCHEMA
    )


def classify_registry_numbers(regs: DataFrame) -> DataFrame:
    """(identifier, registry_number) → (identifier, target_prefix,
    target_id) per the reference's _get_xrefs rules (mesh.py:305-329);
    '0' and unhandled formats drop out. Pure JVM expressions."""
    r = F.col("registry_number")
    ec = F.regexp_replace(
        F.regexp_replace(F.substring(r, 4, 1000), " ", ""),
        r"[.\-]+$", "",
    )
    # canonical lowercase storage prefix ('ncbitaxon'), matching every
    # other source and the registry (normalize/registry.py:36 — the
    # 'NCBITaxon' casing is preferred DISPLAY case, applied at OBO
    # emission); the reference emits the display case here, but mixing
    # cases in the long tables would split one target across two keys
    classified = regs.where(r != "0").select(
        "identifier",
        F.when(r.startswith("txid"), F.lit("ncbitaxon"))
        .when(r.startswith("EC "), F.lit("eccode"))
        .when(r.rlike(_CAS_RE.pattern), F.lit("cas"))
        .when(r.rlike("^" + _UNII_RE.pattern), F.lit("unii"))
        .alias("target_prefix"),
        F.when(r.startswith("txid"), F.expr("substring(registry_number, 5)"))
        .when(r.startswith("EC "), ec)
        .otherwise(r)
        .alias("target_id"),
    )
    return classified.where(F.col("target_prefix").isNotNull())


def read_mesh(
    spark: SparkSession,
    descriptors_path: str,
    supplemental_path: str | None = None,
    prefix: str = PREFIX,
) -> dict[str, DataFrame]:
    """Two MeSH XML dumps → canonical long tables
    {terms, synonyms, parents, xrefs}."""
    desc = _read_records(
        spark, descriptors_path, "DescriptorRecord",
        "DescriptorUI", "DescriptorName/String",
    ).persist()
    # persist the parsed records: terms/synonyms/xrefs each consume
    # recs, and the tree-number self-join consumes desc on BOTH sides —
    # without a cache every consumer re-runs the Python-side XML parse
    # of the whole dump (~6 parses of a multi-GB file). MEMORY_AND_DISK
    # default: the parsed long rows are far smaller than the XML.
    # Release path: the returned tables are derived selections/unions,
    # so .unpersist() on THEM would not free these handles — callers
    # done with the catalog must call the returned ``unpersist()``.
    recs = desc
    supp = None
    if supplemental_path is not None:
        supp = _read_records(
            spark, supplemental_path, "SupplementalRecord",
            "SupplementalRecordUI", "SupplementalRecordName/String",
        ).persist()
        recs = recs.unionByName(supp)

    # synthetic roots: supplemental parent + per-letter tree headers —
    # emitted UNCONDITIONALLY like the reference (MeSHGetter.iter_terms
    # yields SUPPLEMENT_PARENT and every TREE_HEADERS term before the
    # parsed records, mesh.py:90-94)
    roots = spark.createDataFrame(
        [(SUPPLEMENT_PARENT_ID, "supplemental records")]
        + sorted(TREE_HEADER_TO_NAME.items()),
        "identifier string, name string",
    ).select(
        "identifier", "name",
        F.lit(None).cast("string").alias("scope_note"),
    )

    terms = (
        recs.select("identifier", "name", "scope_note")
        .unionByName(roots)
        .select(
            F.lit(prefix).alias("prefix"),
            "identifier",
            "name",
            F.col("scope_note").alias("definition"),
            F.lit(None).cast("string").alias("namespace"),
            F.lit(False).alias("is_obsolete"),
            F.lit(None).cast("string").alias("species_id"),
        )
    )

    synonyms = recs.select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        F.explode("synonyms").alias("text"),
        F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
        F.lit(None).cast("string").alias("type"),
        F.lit(None).cast("array<string>").alias("provenance"),
        F.lit(None).cast("string").alias("language"),
    )

    # ---- tree-number parent resolution: distributed self-join ----
    # (identifier, tree_number), exploded once; reused as both the
    # child side and the lookup map (reference builds
    # tree_number_to_descriptor_ui in memory, mesh.py:226-230)
    tn = desc.select(
        "identifier", F.explode("tree_numbers").alias("tree_number")
    )
    tree_map = tn.select(
        F.col("tree_number").alias("parent_tn"),
        F.col("identifier").alias("parent_id"),
    )
    with_parent_tn = tn.withColumn(
        "parent_tn",
        F.when(
            F.col("tree_number").contains("."),
            F.regexp_replace("tree_number", r"\.[^.]*$", ""),
        ),  # dotless → null → top-level letter leg below
    )
    deep = (
        with_parent_tn.where(F.col("parent_tn").isNotNull())
        # inner join: unresolved parent tree numbers drop out, the
        # reference's "missing tree number" log-and-skip
        .join(tree_map, on="parent_tn")
        .select("identifier", F.col("parent_id").alias("parent"))
    )
    top = with_parent_tn.where(F.col("parent_tn").isNull()).select(
        "identifier",
        F.substring("tree_number", 1, 1).alias("parent"),
    )
    parents = deep.unionByName(top).distinct()
    if supp is not None:
        parents = parents.unionByName(
            supp.select(
                "identifier", F.lit(SUPPLEMENT_PARENT_ID).alias("parent")
            )
        )
    parents = parents.select(
        F.lit(prefix).alias("child_prefix"),
        F.col("identifier").alias("child"),
        F.lit(prefix).alias("parent_prefix"),
        "parent",
    )

    xrefs = classify_registry_numbers(
        recs.select(
            "identifier", F.explode("registry_numbers").alias("registry_number")
        )
    ).select(
        # canonical xrefs schema/order (obo_reader.table_schemas):
        # provenance is a STRING there, not array — schema drift would
        # break unionByName across sources
        F.lit(prefix).alias("prefix"),
        "identifier",
        F.lit("oboInOwl:hasDbXref").alias("predicate"),
        "target_prefix",
        "target_id",
        F.lit(None).cast("string").alias("provenance"),
    ).distinct()

    cached = [df for df in (desc, supp) if df is not None]

    def unpersist(blocking: bool = False) -> None:
        """Release the persisted parsed-record DataFrames (desc/supp).

        The four returned tables are derived from these caches;
        unpersisting the tables themselves would NOT free them.
        """
        for df in cached:
            df.unpersist(blocking)

    return {
        "terms": terms,
        "synonyms": synonyms,
        "parents": parents,
        "xrefs": xrefs,
        "unpersist": unpersist,
    }
