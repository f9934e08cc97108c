"""Functional OWL (OFN) source — native ingestion of the axiom subset
the reference round-trips through ``write_ofn`` (reference
``struct/functional.py:121-193`` ``get_term_axioms`` / ``:220``
``get_typedef_axioms``; the reference READS OWL only via the external
ROBOT Java tool, ``getters.py`` — this module covers the
functional-syntax subset natively so an OFN artifact re-enters the
engine without ROBOT).

OFN is one axiom per line, so ``spark.read.text`` distributes the parse
for free: newline-splittable input, one map-only regexp classification
pass per axiom family (whole-stage codegen, zero Python), and the only
shuffles are the (prefix, identifier)-keyed joins that assemble the
``terms`` table from its label / definition / deprecation assertions —
the same long-table shapes every other source in this package emits.

Prefixes are lowercased on ingest (the repo-wide invariant; the writer
emits the OBO PURL preferred case, e.g. ``obo:CHEBI_99``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# abbreviated OBO entity: obo:{PreferredPrefix}_{id}
_ENT = r"obo:([A-Za-z][A-Za-z0-9.\-]*)_([A-Za-z0-9._\-]+)"
# OFN string literal body (escaped \" and \\ stay encoded; see _unesc)
_LIT = r'"((?:[^"\\]|\\.)*)"'

_PATTERNS = {
    "decl_class": rf"^Declaration\(Class\({_ENT}\)\)$",
    "decl_prop": rf"^Declaration\(ObjectProperty\({_ENT}\)\)$",
    "label": rf"^AnnotationAssertion\(rdfs:label {_ENT} {_LIT}\)$",
    "definition": rf"^AnnotationAssertion\(obo:IAO_0000115 {_ENT} {_LIT}\)$",
    "alt": rf"^AnnotationAssertion\(obo:IAO_0100001 {_ENT} {_ENT}\)$",
    "synonym": (
        r"^AnnotationAssertion\(oboInOwl:has"
        rf"(Exact|Broad|Narrow|Related)Synonym {_ENT} {_LIT}\)$"
    ),
    "dbxref": rf"^AnnotationAssertion\(oboInOwl:hasDbXref {_ENT} {_LIT}\)$",
    "subclass": rf"^SubClassOf\({_ENT} {_ENT}\)$",
    "relation": (
        rf"^SubClassOf\({_ENT} ObjectSomeValuesFrom\({_ENT} {_ENT}\)\)$"
    ),
    "equivalent": rf"^EquivalentClasses\({_ENT} {_ENT}\)$",
    "disjoint": rf"^DisjointClasses\({_ENT} {_ENT}\)$",
    "deprecated": (
        rf'^AnnotationAssertion\(owl:deprecated {_ENT} '
        r'"true"\^\^xsd:boolean\)$'
    ),
}


def _unesc(col):
    """Invert the writer's OFN literal escaping (\\" and \\\\)."""
    return F.regexp_replace(col, r'\\(["\\])', r"$1")


def _extract(lines: DataFrame, pattern: str, cols: list[str]) -> DataFrame:
    """Rows matching ``pattern`` with its capture groups as columns.
    Map-only: one rlike filter + N regexp_extract projections, all
    JVM-side."""
    out = lines.where(F.col("value").rlike(pattern))
    return out.select(
        *[
            F.regexp_extract("value", pattern, i + 1).alias(c)
            for i, c in enumerate(cols)
        ]
    )


def parse_ofn_lines(lines: DataFrame) -> dict[str, DataFrame]:
    """Parse a one-axiom-per-line DataFrame (column ``value``) into the
    engine's long tables. Header lines (``Prefix(...)``, ``Ontology(``,
    the closing ``)``) fall through every anchored pattern and are
    dropped for free."""
    lines = lines.select(F.trim("value").alias("value"))

    def lower(df, *cols):
        return df.select(
            *[
                F.lower(F.col(c)).alias(c) if c in cols else F.col(c)
                for c in df.columns
            ]
        )

    # the term-assembly inputs must be 1:1 per (prefix, identifier) or
    # the join chain below fans out: a legal external OFN may assert two
    # labels / definitions for one class (the writer never does), so
    # declarations dedup and annotations aggregate deterministically
    # (lexicographic min on conflict)
    decl = lower(
        _extract(lines, _PATTERNS["decl_class"], ["prefix", "identifier"]),
        "prefix",
    ).distinct()
    labels = (
        lower(
            _extract(
                lines, _PATTERNS["label"], ["prefix", "identifier", "name"]
            ).withColumn("name", _unesc(F.col("name"))),
            "prefix",
        )
        .groupBy("prefix", "identifier")
        .agg(F.min("name").alias("name"))
    )
    defs = (
        lower(
            _extract(
                lines,
                _PATTERNS["definition"],
                ["prefix", "identifier", "definition"],
            ).withColumn("definition", _unesc(F.col("definition"))),
            "prefix",
        )
        .groupBy("prefix", "identifier")
        .agg(F.min("definition").alias("definition"))
    )
    deprecated = (
        lower(
            _extract(lines, _PATTERNS["deprecated"], ["prefix", "identifier"]),
            "prefix",
        )
        .distinct()
        .withColumn("is_obsolete", F.lit(True))
    )
    terms = (
        decl.join(labels, on=["prefix", "identifier"], how="left")
        .join(defs, on=["prefix", "identifier"], how="left")
        .join(deprecated, on=["prefix", "identifier"], how="left")
        .withColumn("is_obsolete", F.coalesce("is_obsolete", F.lit(False)))
        .select("prefix", "identifier", "name", "definition", "is_obsolete")
    )

    alts = lower(
        _extract(
            lines,
            _PATTERNS["alt"],
            ["alt_prefix", "alt_id", "prefix", "identifier"],
        ),
        "alt_prefix",
        "prefix",
    ).select("prefix", "identifier", "alt_id")

    synonyms = lower(
        _extract(
            lines,
            _PATTERNS["synonym"],
            ["kind", "prefix", "identifier", "text"],
        )
        .withColumn("text", _unesc(F.col("text")))
        .withColumn(
            "predicate",
            F.concat(F.lit("oboInOwl:has"), F.col("kind"), F.lit("Synonym")),
        )
        .drop("kind"),
        "prefix",
    ).select("prefix", "identifier", "text", "predicate")

    dbx = (
        lower(
            _extract(
                lines, _PATTERNS["dbxref"], ["prefix", "identifier", "curie"]
            ).withColumn("curie", _unesc(F.col("curie"))),
            "prefix",
        )
        .withColumn("predicate", F.lit("oboInOwl:hasDbXref"))
        .withColumn(
            "target_prefix",
            F.lower(F.substring_index("curie", ":", 1)),
        )
        .withColumn(
            "target_id",
            # everything after the FIRST colon (target ids may contain
            # colons themselves)
            F.expr("substring(curie, instr(curie, ':') + 1)"),
        )
        .select(
            "prefix", "identifier", "predicate", "target_prefix", "target_id"
        )
    )
    equiv = lower(
        _extract(
            lines,
            _PATTERNS["equivalent"],
            ["prefix", "identifier", "target_prefix", "target_id"],
        ),
        "prefix",
        "target_prefix",
    ).withColumn("predicate", F.lit("owl:equivalentClass"))
    xrefs = dbx.unionByName(
        equiv.select(
            "prefix", "identifier", "predicate", "target_prefix", "target_id"
        )
    )

    parents = lower(
        _extract(
            lines,
            _PATTERNS["subclass"],
            ["child_prefix", "child", "parent_prefix", "parent"],
        ),
        "child_prefix",
        "parent_prefix",
    )

    # relation_prefix keeps the as-written (preferred) case — the OBO
    # reader's convention too (obo_reader.py relations: term/target
    # prefixes lowercase, the predicate CURIE prefix as-written)
    relations = lower(
        _extract(
            lines,
            _PATTERNS["relation"],
            [
                "prefix",
                "identifier",
                "relation_prefix",
                "relation_id",
                "target_prefix",
                "target_id",
            ],
        ),
        "prefix",
        "target_prefix",
    )

    disjoints = lower(
        _extract(
            lines,
            _PATTERNS["disjoint"],
            ["prefix", "identifier", "target_prefix", "target_id"],
        ),
        "prefix",
        "target_prefix",
    )

    prop_decl = lower(
        _extract(lines, _PATTERNS["decl_prop"], ["prefix", "identifier"]),
        "prefix",
    ).distinct()
    typedefs = (
        prop_decl.join(labels, on=["prefix", "identifier"], how="left")
        .select("prefix", "identifier", "name")
    )

    return {
        "terms": terms,
        "synonyms": synonyms,
        "xrefs": xrefs,
        "relations": relations,
        "parents": parents,
        "alts": alts,
        "typedefs": typedefs,
        "disjoints": disjoints,
    }


def read_ofn(
    spark: SparkSession, path: str, persist_lines: bool = False
) -> dict[str, DataFrame]:
    """Read an OFN document (file, directory of part files, or glob)
    into the engine's long tables. Newline-splittable, so a multi-GB
    uncompressed document scans in parallel; each returned table is an
    independent map-only selection over the same text scan.

    ``persist_lines``: callers that materialize SEVERAL of the returned
    tables (the db-build pipeline reads all eight) should pass True —
    otherwise every table's action re-scans and re-regexes the whole
    document (~15 scans for a full build: terms alone joins four
    families). The cache is the raw line table (MEMORY_AND_DISK, spills,
    never recomputes) and the returned dict then carries an
    ``"unpersist"`` callback that owns its release — same contract as
    ``mesh_source.read_mesh``."""
    lines = spark.read.text(path)
    if not persist_lines:
        return parse_ofn_lines(lines)
    from pyspark.storagelevel import StorageLevel

    cached = lines.persist(StorageLevel.MEMORY_AND_DISK)
    tables = parse_ofn_lines(cached)

    def unpersist(blocking: bool = False) -> None:
        """Release the shared line cache (the returned tables are
        derived selections — unpersisting THEM would not free it)."""
        cached.unpersist(blocking)

    tables["unpersist"] = unpersist
    return tables
