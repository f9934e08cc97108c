"""Distributed SKOS (N-Triples) and OBO-Graph JSON sinks.

Reference parity: ``struct/skos/export.py:21-133`` (``write_skos`` —
ConceptScheme node, each term a skos:Concept with inScheme / prefLabel /
definition / altLabel, parents as broadMatch + narrowMatch pairs) and
``struct/obograph/export.py:25-61`` (``write_obograph`` — GraphDocument
with nodes {id, lbl, type, meta.deprecated} and edges {sub, pred, obj}).

Spark-first rewrite, not a port: the reference builds an in-memory
rdflib Graph / pydantic document on the driver. Here every triple and
every node/edge JSON record is a ROW, so serialization is a map-only
column expression (`concat`/`to_json`, JVM codegen) and the sink is
`write.text` — an ncbigene-sized ontology streams straight from
executors to part files with zero driver materialization. N-Triples and
JSON-lines are line-oriented formats, which is exactly why they're the
scale path (same argument as the N-Triples reader,
sources/ntriples.py).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKOS = "http://www.w3.org/2004/02/skos/core#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OBO_PURL = "http://purl.obolibrary.org/obo/"


def _esc_lit(col):
    """N-Triples literal escaping (backslash first, then quote/newline/
    tab) — inverse of the reader's unescape (sources/ntriples.py)."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def _term_iri(prefix_col, id_col):
    """CURIE → OBO PURL with registry preferred casing (the same
    expansion rule the registry's uri_prefixes record for OBO
    ontologies: http://purl.obolibrary.org/obo/{Prefix}_{id})."""
    from ..normalize.registry import preferred_case_col

    return F.concat(
        F.lit(OBO_PURL), preferred_case_col(prefix_col), F.lit("_"), id_col
    )


def _curie_iri(curie_col):
    """Whole-CURIE → IRI: registered URI prefixes (xsd, skos, rdfs...)
    expand via the registry's uri_prefixes; everything else takes the
    OBO PURL convention. All OBO-Graph id fields must be IRIs — raw
    CURIEs next to IRI-keyed nodes break consumers (r03 review)."""
    from ..normalize.registry import Registry

    pairs = []
    for rec in Registry.default().records.values():
        if rec.uri_prefixes:
            pairs += [F.lit(rec.prefix), F.lit(rec.uri_prefixes[0])]
    pfx = F.lower(F.split(curie_col, ":").getItem(0))
    local = F.substring_index(curie_col, ":", -1)
    known = F.create_map(*pairs)[pfx] if pairs else F.lit(None)
    return F.when(
        known.isNotNull(), F.concat(known, local)
    ).otherwise(
        _term_iri(F.split(curie_col, ":").getItem(0), local)
    )


def _uri_triple(s, p, o):
    return F.concat(
        F.lit("<"), s, F.lit("> <"), F.lit(p), F.lit("> <"), o, F.lit("> .")
    )


def _lit_triple(s, p, o, lang=None):
    parts = [
        F.lit("<"), s, F.lit("> <"), F.lit(p), F.lit('> "'), _esc_lit(o),
        F.lit('"'),
    ]
    if lang is not None:
        parts += [
            F.when(lang.isNotNull(), F.concat(F.lit("@"), lang)).otherwise(
                F.lit("")
            )
        ]
    parts += [F.lit(" .")]
    return F.concat(*parts)


def skos_triples(
    terms: DataFrame,
    synonyms: DataFrame,
    parents: DataFrame,
    prefix: str,
) -> DataFrame:
    """One N-Triples line per row: the reference's SKOS export
    (skos/export.py:48-133) as a union of map-only projections.

    Returns a single-column (`value`) DataFrame ready for
    ``df.write.text`` — no driver collect at any size."""
    scheme = f"{OBO_PURL}{prefix}.ttl"
    spark = terms.sparkSession
    t = terms.where(F.col("prefix") == prefix)
    iri = _term_iri(F.col("prefix"), F.col("identifier"))

    head = spark.createDataFrame(
        [(f"<{scheme}> <{RDF_TYPE}> <{SKOS}ConceptScheme> .",)], "value string"
    )
    concept = t.select(
        _uri_triple(iri, RDF_TYPE, F.lit(SKOS + "Concept")).alias("value")
    )
    in_scheme = t.select(
        _uri_triple(iri, SKOS + "inScheme", F.lit(scheme)).alias("value")
    )
    pref = t.where(F.col("name").isNotNull()).select(
        _lit_triple(iri, SKOS + "prefLabel", F.col("name")).alias("value")
    )
    defin = t.where(F.col("definition").isNotNull()).select(
        _lit_triple(iri, SKOS + "definition", F.col("definition")).alias(
            "value"
        )
    )
    syn = synonyms.where(F.col("prefix") == prefix).select(
        _lit_triple(
            _term_iri(F.col("prefix"), F.col("identifier")),
            SKOS + "altLabel",
            F.col("text"),
            lang=F.col("language") if "language" in synonyms.columns
            else F.lit(None).cast("string"),
        ).alias("value")
    )
    par = parents.where(F.col("child_prefix") == prefix)
    child_iri = _term_iri(F.col("child_prefix"), F.col("child"))
    parent_iri = _term_iri(F.col("parent_prefix"), F.col("parent"))
    broad = par.select(
        _uri_triple(child_iri, SKOS + "broadMatch", parent_iri).alias("value")
    )
    narrow = par.select(
        _uri_triple(parent_iri, SKOS + "narrowMatch", child_iri).alias("value")
    )
    # reference adds inScheme for parents inside the same ontology
    par_scheme = par.where(F.col("parent_prefix") == prefix).select(
        _uri_triple(parent_iri, SKOS + "inScheme", F.lit(scheme)).alias(
            "value"
        )
    )
    out = head
    for part in (concept, in_scheme, pref, defin, syn, broad, narrow,
                 par_scheme):
        out = out.unionByName(part)
    return out


def write_skos(
    terms: DataFrame,
    synonyms: DataFrame,
    parents: DataFrame,
    prefix: str,
    path: str,
) -> None:
    """Distributed SKOS sink: triples → ``write.text`` part files."""
    skos_triples(terms, synonyms, parents, prefix).write.mode(
        "overwrite"
    ).text(path)


# --------------------------------------------------------------- obograph --


def obograph_axiom_records(
    xrefs: DataFrame | None,
    typedefs: DataFrame | None,
    prefix: str,
) -> DataFrame | None:
    """The OBO-Graph axiom families beyond nodes/edges
    (obograph/export.py:83-128): equivalentNodesSets from
    owl:equivalentClass pairs, domainRangeAxioms and
    propertyChainAxioms from the typedef dim. Same (record_type, value)
    JSON-lines shape; None when no source table is supplied."""
    parts = []
    if xrefs is not None:
        eq = xrefs.where(
            (F.col("prefix") == prefix)
            & (F.col("predicate") == "owl:equivalentClass")
        ).select(
            F.lit("equivalentNodesSet").alias("record_type"),
            F.to_json(
                F.struct(
                    F.array(
                        _term_iri(F.col("prefix"), F.col("identifier")),
                        _term_iri(
                            F.col("target_prefix"), F.col("target_id")
                        ),
                    ).alias("nodeIds")
                )
            ).alias("value"),
        )
        parts.append(eq)
    if typedefs is not None:
        td = typedefs
        if "ontology" in td.columns:
            td = td.where(F.col("ontology") == prefix)
        td_iri = _term_iri(F.col("prefix"), F.col("identifier"))
        dr = td.where(
            F.col("domain").isNotNull() | F.col("range").isNotNull()
        ).select(
            F.lit("domainRangeAxiom").alias("record_type"),
            F.to_json(
                F.struct(
                    td_iri.alias("predicateId"),
                    F.when(
                        F.col("domain").isNotNull(),
                        F.array(_curie_iri(F.col("domain"))),
                    ).otherwise(F.array().cast("array<string>")).alias(
                        "domainClassIds"
                    ),
                    F.when(
                        F.col("range").isNotNull(),
                        F.array(_curie_iri(F.col("range"))),
                    ).otherwise(F.array().cast("array<string>")).alias(
                        "rangeClassIds"
                    ),
                )
            ).alias("value"),
        )
        parts.append(dr)
        if "holds_over_chain" in td.columns:
            pc = td.where(
                F.col("holds_over_chain").isNotNull()
                & (F.size("holds_over_chain") > 0)
            ).select(
                F.lit("propertyChainAxiom").alias("record_type"),
                F.explode("holds_over_chain").alias("chain"),
                td_iri.alias("pid"),
            ).select(
                "record_type",
                F.to_json(
                    F.struct(
                        F.col("pid").alias("predicateId"),
                        F.transform(
                            "chain", lambda c: _curie_iri(c)
                        ).alias("chainPredicateIds"),
                    )
                ).alias("value"),
            )
            parts.append(pc)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def obograph_records(
    terms: DataFrame,
    parents: DataFrame,
    relations: DataFrame,
    prefix: str,
    typedefs: DataFrame | None = None,
) -> DataFrame:
    """(record_type, value) JSON-lines form of the OBO-Graph document:
    one `node` record per term, one `edge` per is_a/relationship row
    (obograph/export.py node/edge shapes). This is the scale path —
    downstream Spark/jq consumers read it directly; the single-document
    form is assembled by :func:`obograph_document`."""
    t = terms.where(F.col("prefix") == prefix)
    iri = _term_iri(F.col("prefix"), F.col("identifier"))
    nodes = t.select(
        F.lit("node").alias("record_type"),
        F.to_json(
            F.struct(
                iri.alias("id"),
                F.col("name").alias("lbl"),
                F.lit("CLASS").alias("type"),
                F.struct(
                    F.col("is_obsolete").alias("deprecated")
                ).alias("meta"),
            )
        ).alias("value"),
    )
    isa = parents.where(F.col("child_prefix") == prefix).select(
        F.lit("edge").alias("record_type"),
        F.to_json(
            F.struct(
                _term_iri(F.col("child_prefix"), F.col("child")).alias("sub"),
                F.lit("is_a").alias("pred"),
                _term_iri(F.col("parent_prefix"), F.col("parent")).alias(
                    "obj"
                ),
            )
        ).alias("value"),
    )
    rel = relations.where(F.col("prefix") == prefix).select(
        F.lit("edge").alias("record_type"),
        F.to_json(
            F.struct(
                _term_iri(F.col("prefix"), F.col("identifier")).alias("sub"),
                F.concat_ws(
                    ":", F.col("relation_prefix"), F.col("relation_id")
                ).alias("pred"),
                _term_iri(
                    F.col("target_prefix"), F.col("target_id")
                ).alias("obj"),
            )
        ).alias("value"),
    )
    out = nodes.unionByName(isa).unionByName(rel)
    if typedefs is not None:
        # typedef PROPERTY nodes (obograph/export.py node type for
        # TypeDefs; test_full.py test_typedef_1 expects type=PROPERTY)
        td = typedefs
        if "ontology" in td.columns:
            td = td.where(F.col("ontology") == prefix)
        td_nodes = td.select(
            F.lit("node").alias("record_type"),
            F.to_json(
                F.struct(
                    _term_iri(F.col("prefix"), F.col("identifier")).alias(
                        "id"
                    ),
                    F.col("name").alias("lbl"),
                    F.lit("PROPERTY").alias("type"),
                )
            ).alias("value"),
        )
        out = out.unionByName(td_nodes)
    return out


def write_obograph_jsonl(
    terms: DataFrame,
    parents: DataFrame,
    relations: DataFrame,
    prefix: str,
    path: str,
) -> None:
    """Distributed OBO-Graph sink (JSON-lines, partitioned by record
    type so nodes/edges land in separate directories)."""
    obograph_records(terms, parents, relations, prefix).write.mode(
        "overwrite"
    ).partitionBy("record_type").text(path)


def obograph_document(
    terms: DataFrame,
    parents: DataFrame,
    relations: DataFrame,
    prefix: str,
    xrefs: DataFrame | None = None,
    typedefs: DataFrame | None = None,
) -> str:
    """Standard single-document OBO-Graph JSON for ONE ontology —
    bounded driver assembly (same contract note as
    obo_writer.obo_document): graphs[0] = {id, nodes, edges}. Round-trips
    through sources/obograph.read_obograph."""
    recs = obograph_records(
        terms, parents, relations, prefix, typedefs=typedefs
    )
    ax = obograph_axiom_records(xrefs, typedefs, prefix)
    if ax is not None:
        recs = recs.unionByName(ax)
    rows = recs.orderBy("record_type", "value").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["record_type"], []).append(
            json.loads(r["value"])
        )
    graph: dict = {
        "id": f"{OBO_PURL}{prefix}.owl",
        "nodes": by_type.get("node", []),
        "edges": by_type.get("edge", []),
    }
    if "equivalentNodesSet" in by_type:
        graph["equivalentNodesSets"] = by_type["equivalentNodesSet"]
    if "domainRangeAxiom" in by_type:
        graph["domainRangeAxioms"] = by_type["domainRangeAxiom"]
    if "propertyChainAxiom" in by_type:
        graph["propertyChainAxioms"] = by_type["propertyChainAxiom"]
    doc = {"graphs": [graph]}
    return json.dumps(doc, indent=1, sort_keys=True)
