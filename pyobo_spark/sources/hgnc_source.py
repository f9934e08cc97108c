"""HGNC-envelope JSON nomenclature source — fifth source exemplar,
covering the reference's most common *API-payload* plugin idiom
(sources/hgnc/hgnc.py:270-420): one JSON document whose records live
under a nested envelope (``response.docs``), with

- banana-prefixed local ids (``"hgnc_id": "HGNC:5"`` → ``5``,
  hgnc.py:293-296),
- a status field driving obsolescence (``Approved`` → live, anything
  else obsolete, hgnc.py:298-305),
- symbol-as-name / name-as-definition swap (hgnc.py:307-310),
- multi-valued per-key xref columns with per-prefix identifier fixups
  (merops ``-``→``.``, refseq dot strip) and the reference's
  single-value⇒exact-match / multi-value⇒plain-xref routing
  (hgnc.py:388-415, gene_xrefs table hgnc.py:62-84),
- alias/previous symbol arrays → typed synonyms (hgnc.py:427-436):
  both are EXACT-specificity in the reference (append_synonym defaults),
  typed ``OMO:0003016`` (gene symbol synonym) / ``OMO:0003015``
  (previous name) per struct.py:252-260.

Spark-first shape: ``spark.read.json(multiLine)`` → one ``explode`` of
the envelope array → the same declarative projections as the other
source exemplars. A single multi-line JSON document is NOT splittable —
fine for HGNC's ~45k genes (one task), but for a large payload convert
the envelope to JSON-lines once (``SELECT explode(response.docs)`` →
``write.json``) and every downstream read is parallel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: (xref target prefix, envelope key) — excerpt of the reference's
#: gene_xrefs table (hgnc.py:62-84) with both fixup cases included
DEFAULT_GENE_XREFS: tuple[tuple[str, str], ...] = (
    ("ensembl", "ensembl_gene_id"),
    ("ncbigene", "entrez_id"),
    ("merops.entry", "merops"),
    ("refseq", "refseq_accession"),
    ("omim", "omim_id"),
    ("ccds", "ccds_id"),
)


@dataclass
class EnvelopeSpec:
    """Declarative description of an HGNC-style API payload."""

    prefix: str = "hgnc"
    docs_path: str = "response.docs"     # dotted path to the record array
    identifier: str = "hgnc_id"          # banana-prefixed local id field
    banana: str | None = "HGNC:"         # prefix to strip off identifiers
    name: str = "symbol"                 # reference: symbol becomes name
    definition: str = "name"             # ...and name becomes definition
    status: str | None = "status"        # 'Approved' ⇒ live
    approved_value: str = "Approved"
    #: envelope field → (predicate, synonym-type CURIE). The reference
    #: keeps both at EXACT specificity and distinguishes them by TYPE
    #: (hgnc.py:427-436 + struct.py:252-260) — downgrading prev_symbol
    #: to a related synonym would change grounding scores (the matcher
    #: weights exact 0.9 vs related 0.5).
    synonym_fields: dict[str, tuple[str, str]] = field(
        default_factory=lambda: {
            "alias_symbol": ("oboInOwl:hasExactSynonym", "OMO:0003016"),
            "prev_symbol": ("oboInOwl:hasExactSynonym", "OMO:0003015"),
        }
    )
    gene_xrefs: tuple[tuple[str, str], ...] = DEFAULT_GENE_XREFS


def _docs(spark: SparkSession, path: str, spec: EnvelopeSpec) -> DataFrame:
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(F.explode(spec.docs_path).alias("d")).select("d.*")


def _fixup(prefix: str, col):
    """Per-prefix identifier cleanup, verbatim semantics from
    hgnc.py:395-401."""
    if prefix == "merops.entry":
        return F.replace(col, F.lit("-"), F.lit("."))
    if prefix == "refseq":
        # reference uses str.strip('.') — BOTH ends (hgnc.py:401)
        return F.regexp_replace(col, r"^\.+|\.+$", "")
    return col


def read_hgnc_json(
    spark: SparkSession, path: str, spec: EnvelopeSpec | None = None
) -> dict[str, DataFrame]:
    """HGNC-envelope JSON → {terms, synonyms, xrefs, relations} long
    tables (relations carries the from_species edge per gene). Every
    table is always present — empty but schema-typed when the payload
    has no matching fields — so catalog lookups never hit a None."""
    spec = spec or EnvelopeSpec()
    docs = _docs(spark, path, spec)
    cols = set(docs.columns)

    ident = F.col(spec.identifier).cast("string")
    if spec.banana:
        ident = F.when(
            ident.startswith(spec.banana),
            ident.substr(F.lit(len(spec.banana) + 1), F.length(ident)),
        ).otherwise(ident)
    ident = ident.alias("identifier")

    obsolete = (
        # null status counts as not-approved (the reference raises on
        # records without one, hgnc.py:293-305 — degrade, don't crash)
        F.coalesce(F.col(spec.status) != spec.approved_value, F.lit(True))
        if spec.status in cols
        else F.lit(False)
    )
    terms = docs.select(
        F.lit(spec.prefix).alias("prefix"),
        ident,
        (
            F.col(spec.name).cast("string")
            if spec.name in cols
            else F.lit(None).cast("string")
        ).alias("name"),
        (
            F.col(spec.definition).cast("string")
            if spec.definition in cols
            else F.lit(None).cast("string")
        ).alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        obsolete.alias("is_obsolete"),
        F.lit("9606").alias("species_id"),  # hgnc.py:281 — human
    )

    syn_frames = []
    for fld, (predicate, syn_type) in spec.synonym_fields.items():
        if fld not in cols:
            continue
        syn_frames.append(
            docs.where(F.col(fld).isNotNull())
            .select(ident, F.explode(fld).alias("text"))
            .select(
                F.lit(spec.prefix).alias("prefix"),
                "identifier",
                F.col("text").cast("string").alias("text"),
                F.lit(predicate).alias("predicate"),
                F.lit(syn_type).alias("type"),
                F.lit(None).cast("array<string>").alias("provenance"),
                F.lit(None).cast("string").alias("language"),
            )
        )
    synonyms = spark.createDataFrame(
        [],
        "prefix string, identifier string, text string, predicate string, "
        "type string, provenance array<string>, language string",
    )
    for sf in syn_frames:
        synonyms = synonyms.unionByName(sf)

    # xref routing: a key whose value is scalar (or a 1-element array)
    # becomes skos:exactMatch; multi-valued arrays become plain
    # oboInOwl:hasDbXref rows (hgnc.py:404-415)
    xref_frames = []
    for target_prefix, key in spec.gene_xrefs:
        if key not in cols:
            continue
        dt = docs.schema[key].dataType.typeName()
        vals = (
            F.col(key)
            if dt == "array"
            else F.array(F.col(key).cast("string"))
        )
        leg = (
            docs.where(F.col(key).isNotNull())
            .select(ident, F.size(vals).alias("n"), vals.alias("vals"))
            .select(
                "identifier",
                "n",
                F.explode("vals").alias("target_raw"),
            )
            .select(
                F.lit(spec.prefix).alias("prefix"),
                "identifier",
                F.when(F.col("n") == 1, "skos:exactMatch")
                .otherwise("oboInOwl:hasDbXref")
                .alias("predicate"),
                F.lit(target_prefix).alias("target_prefix"),
                _fixup(target_prefix, F.col("target_raw").cast("string")).alias(
                    "target_id"
                ),
                F.lit(None).cast("string").alias("provenance"),
            )
            .where(F.col("target_id").isNotNull() & (F.col("target_id") != ""))
        )
        xref_frames.append(leg)
    xrefs = spark.createDataFrame(
        [],
        "prefix string, identifier string, predicate string, "
        "target_prefix string, target_id string, provenance string",
    )
    for xf in xref_frames:
        xrefs = xrefs.unionByName(xf)

    # from_species relations (RO:0002162 → NCBITaxon:9606, hgnc.py:281 +
    # struct.py:1659-1675) so the catalog species API works end-to-end
    relations = docs.select(
        F.lit(spec.prefix).alias("prefix"),
        ident,
        F.lit("RO").alias("relation_prefix"),
        F.lit("0002162").alias("relation_id"),
        F.lit("ncbitaxon").alias("target_prefix"),
        F.lit("9606").alias("target_id"),
    )

    # Always emit every table (empty but schema-typed when the payload
    # has no matching fields) — a missing key would leave the catalog's
    # corresponding attribute None and crash its lookups.
    return {
        "terms": terms,
        "synonyms": synonyms,
        "xrefs": xrefs,
        "relations": relations,
    }
