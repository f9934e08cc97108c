"""Functional OWL (OFN) sink — the reference's ``write_ofn``
(``struct.py:1158-1163`` → ``struct/functional.py:121-193``
``get_term_axioms`` / ``:220`` ``get_typedef_axioms``) re-expressed as a
Spark plan.

The reference builds a funowl object graph on the driver and serializes
it. OFN is one axiom per line, so here every axiom is a ROW built by a
map-only ``concat`` projection, globally ordered, and written with
``write.text`` — the same zero-driver-materialization contract as
``obo_writer.write_obo_document``. ``write_owl`` (ROBOT conversion of
the OFN) stays out of scope — external Java tool.

Axiom families covered (numbering follows get_term_axioms):
Declaration(Class) · SubClassOf (is_a) · rdfs:label ·
definition (IAO:0000115) · alt-id replaced-by (IAO:0100001) ·
synonyms (oboInOwl predicate vocabulary) · xrefs (oboInOwl:hasDbXref
literal) · relationships (SubClassOf ObjectSomeValuesFrom) ·
owl:deprecated · Declaration(ObjectProperty) + label for typedefs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OBO_PURL = "http://purl.obolibrary.org/obo/"

_PREFIXES = (
    ("owl", "http://www.w3.org/2002/07/owl#"),
    ("rdf", "http://www.w3.org/1999/02/22-rdf-syntax-ns#"),
    ("rdfs", "http://www.w3.org/2000/01/rdf-schema#"),
    ("xsd", "http://www.w3.org/2001/XMLSchema#"),
    ("obo", OBO_PURL),
    ("oboInOwl", "http://www.geneontology.org/formats/oboInOwl#"),
)


def _esc(col):
    """OFN string-literal escaping: backslash and double-quote."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    return F.regexp_replace(out, '"', r'\\"')


def _obo_entity(prefix_col, id_col):
    """CURIE → `obo:{PreferredPrefix}_{id}` abbreviated IRI (the OBO
    PURL convention the reference's converter expands to)."""
    from ..normalize.registry import preferred_case_col

    return F.concat(
        F.lit("obo:"), preferred_case_col(prefix_col), F.lit("_"), id_col
    )


_SYN_PRED = {
    "oboInOwl:hasExactSynonym": "oboInOwl:hasExactSynonym",
    "oboInOwl:hasBroadSynonym": "oboInOwl:hasBroadSynonym",
    "oboInOwl:hasNarrowSynonym": "oboInOwl:hasNarrowSynonym",
    "oboInOwl:hasRelatedSynonym": "oboInOwl:hasRelatedSynonym",
    "rdfs:label": "rdfs:label",
}


def ofn_axioms(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    alts: DataFrame,
    prefix: str,
    typedefs: DataFrame | None = None,
    disjoints: DataFrame | None = None,
) -> DataFrame:
    """(sort_id, family, value) — one OFN axiom per row, map-only."""
    t = terms.where(F.col("prefix") == prefix)
    ent = _obo_entity(F.col("prefix"), F.col("identifier"))

    def fam(df, order, line):
        return df.select(
            F.col("identifier").alias("sort_id"),
            F.lit(float(order)).cast("double").alias("family"),
            line.alias("value"),
        )

    out = fam(t, 0, F.concat(F.lit("Declaration(Class("), ent, F.lit("))")))
    out = out.unionByName(
        fam(
            t.where(F.col("name").isNotNull()),
            1,
            F.concat(
                F.lit("AnnotationAssertion(rdfs:label "), ent, F.lit(' "'),
                _esc(F.col("name")), F.lit('")'),
            ),
        )
    )
    out = out.unionByName(
        fam(
            t.where(F.col("definition").isNotNull()),
            2,
            F.concat(
                F.lit("AnnotationAssertion(obo:IAO_0000115 "), ent,
                F.lit(' "'), _esc(F.col("definition")), F.lit('")'),
            ),
        )
    )
    # alt ids: ReplacedByMacro(alt, s) — the ALT carries the pointer
    out = out.unionByName(
        fam(
            alts.where(F.col("prefix") == prefix),
            3,
            F.concat(
                F.lit("AnnotationAssertion(obo:IAO_0100001 "),
                _obo_entity(F.col("prefix"), F.col("alt_id")),
                F.lit(" "),
                _obo_entity(F.col("prefix"), F.col("identifier")),
                F.lit(")"),
            ),
        )
    )
    spred = F.create_map(
        *[F.lit(x) for kv in _SYN_PRED.items() for x in kv]
    )
    out = out.unionByName(
        fam(
            synonyms.where(
                (F.col("prefix") == prefix)
                & (F.col("predicate") != "rdfs:label")
            ),
            4,
            F.concat(
                F.lit("AnnotationAssertion("),
                F.coalesce(
                    spred[F.col("predicate")],
                    F.lit("oboInOwl:hasRelatedSynonym"),
                ),
                F.lit(" "), ent, F.lit(' "'), _esc(F.col("text")),
                F.lit('")'),
            ),
        )
    )
    out = out.unionByName(
        fam(
            xrefs.where(
                (F.col("prefix") == prefix)
                & (F.col("predicate") == "oboInOwl:hasDbXref")
            ),
            5,
            F.concat(
                F.lit("AnnotationAssertion(oboInOwl:hasDbXref "), ent,
                F.lit(' "'),
                _esc(
                    F.concat_ws(":", F.col("target_prefix"),
                                F.col("target_id"))
                ),
                F.lit('")'),
            ),
        )
    )
    out = out.unionByName(
        parents.where(F.col("child_prefix") == prefix).select(
            F.col("child").alias("sort_id"),
            F.lit(6).alias("family"),
            F.concat(
                F.lit("SubClassOf("),
                _obo_entity(F.col("child_prefix"), F.col("child")),
                F.lit(" "),
                _obo_entity(F.col("parent_prefix"), F.col("parent")),
                F.lit(")"),
            ).alias("value"),
        )
    )
    out = out.unionByName(
        fam(
            relations.where(F.col("prefix") == prefix),
            7,
            F.concat(
                F.lit("SubClassOf("), ent,
                F.lit(" ObjectSomeValuesFrom("),
                _obo_entity(
                    F.col("relation_prefix"), F.col("relation_id")
                ),
                F.lit(" "),
                _obo_entity(F.col("target_prefix"), F.col("target_id")),
                F.lit("))"),
            ),
        )
    )
    # equivalent_to / macro-equivalent xrefs → EquivalentClasses (#16)
    out = out.unionByName(
        fam(
            xrefs.where(
                (F.col("prefix") == prefix)
                & (F.col("predicate") == "owl:equivalentClass")
            ),
            7.5,
            F.concat(
                F.lit("EquivalentClasses("), ent, F.lit(" "),
                _obo_entity(F.col("target_prefix"), F.col("target_id")),
                F.lit(")"),
            ),
        )
    )
    if disjoints is not None:
        out = out.unionByName(
            fam(
                disjoints.where(F.col("prefix") == prefix),
                7.7,
                F.concat(
                    F.lit("DisjointClasses("), ent, F.lit(" "),
                    _obo_entity(
                        F.col("target_prefix"), F.col("target_id")
                    ),
                    F.lit(")"),
                ),
            )
        )
    out = out.unionByName(
        fam(
            t.where(F.col("is_obsolete")),
            8,
            F.concat(
                F.lit("AnnotationAssertion(owl:deprecated "), ent,
                F.lit(' "true"^^xsd:boolean)'),
            ),
        )
    )
    if typedefs is not None:
        td = typedefs
        if "ontology" in td.columns:
            td = td.where(F.col("ontology") == prefix)
        td_ent = _obo_entity(F.col("prefix"), F.col("identifier"))
        out = out.unionByName(
            fam(
                td, 9,
                F.concat(
                    F.lit("Declaration(ObjectProperty("), td_ent,
                    F.lit("))"),
                ),
            )
        )
        out = out.unionByName(
            fam(
                td.where(F.col("name").isNotNull()),
                10,
                F.concat(
                    F.lit("AnnotationAssertion(rdfs:label "), td_ent,
                    F.lit(' "'), _esc(F.col("name")), F.lit('")'),
                ),
            )
        )
    return out


def _header(prefix: str, version: str | None) -> list[str]:
    lines = [f"Prefix({p}:=<{iri}>)" for p, iri in _PREFIXES]
    iri = f"{OBO_PURL}{prefix}.owl"
    vline = (
        f"Ontology(<{iri}> <{OBO_PURL}{prefix}/{version}/{prefix}.owl>"
        if version
        else f"Ontology(<{iri}>"
    )
    return [*lines, "", vline]


def write_ofn(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    alts: DataFrame,
    prefix: str,
    path: str,
    version: str | None = None,
    typedefs: DataFrame | None = None,
    disjoints: DataFrame | None = None,
    axioms: DataFrame | None = None,
) -> None:
    """Distributed OFN document: header rows ∪ axiom rows, globally
    ordered (header → axioms by (term, family) → footer), write.text.

    ``axioms``: pass a prebuilt (possibly cached) ofn_axioms result to
    avoid recomputing the plan when the caller also counts it."""
    ax = axioms if axioms is not None else ofn_axioms(
        terms, synonyms, xrefs, relations, parents, alts, prefix,
        typedefs=typedefs, disjoints=disjoints,
    )
    spark = terms.sparkSession
    head = spark.createDataFrame(
        [(0, "", float(i), v) for i, v in enumerate(_header(prefix, version))],
        "ord int, sort_id string, family double, value string",
    )
    foot = spark.createDataFrame(
        [(2, "", 0.0, ")")], "ord int, sort_id string, family double, value string"
    )
    (
        head.unionByName(
            ax.select(
                F.lit(1).alias("ord"), "sort_id", "family", "value"
            )
        )
        .unionByName(foot)
        .orderBy("ord", "sort_id", "family", "value")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def ofn_document(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    alts: DataFrame,
    prefix: str,
    version: str | None = None,
    typedefs: DataFrame | None = None,
    disjoints: DataFrame | None = None,
) -> str:
    """Bounded driver-side assembly of the same document (tests /
    small-ontology convenience; same contract note as obo_document)."""
    ax = ofn_axioms(
        terms, synonyms, xrefs, relations, parents, alts, prefix,
        typedefs=typedefs, disjoints=disjoints,
    )
    rows = ax.orderBy("sort_id", "family", "value").collect()
    body = [r["value"] for r in rows]
    return "\n".join([*_header(prefix, version), *body, ")"]) + "\n"
