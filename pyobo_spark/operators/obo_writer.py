"""OBO text serialization — the reference's write_obo sink
(struct.py:1121-1179) as a Spark op: tag lines are built with concat
expressions per table, grouped per term with a deterministic tag order,
stanzas sorted by identifier (the reference sorts terms on
materialization, struct.py:1461-1468). Output is a DataFrame of
(identifier, stanza_text) — `write.text` after `orderBy` reproduces the
byte-deterministic output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# inverse of reader SPEC_TO_PREDICATE (struct.py:157-160)
PREDICATE_TO_SPEC = {
    "oboInOwl:hasExactSynonym": "EXACT",
    "oboInOwl:hasBroadSynonym": "BROAD",
    "oboInOwl:hasNarrowSynonym": "NARROW",
    "oboInOwl:hasRelatedSynonym": "RELATED",
}


def _preferred_case(prefix: str) -> str:
    """Canonical output casing (reference: bioregistry preferred prefix
    via Reference.preferred_curie) — delegates to the registry's single
    source of truth."""
    from ..normalize.registry import preferred_case

    return preferred_case(prefix)


def _pc(col):
    from ..normalize.registry import preferred_case_col

    return preferred_case_col(col)


def _esc(col):
    """OBO escaping (obo_escape_slim, struct.py:205-207): backslash,
    quote, newline, tab."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\t", r"\\t")
    return out


def obo_stanzas(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    alts: DataFrame,
    prefix: str,
    subsets: DataFrame | None = None,
    intersections: DataFrame | None = None,
    replaced_by: DataFrame | None = None,
    considers: DataFrame | None = None,
    disjoints: DataFrame | None = None,
) -> DataFrame:
    """Render [Term] stanzas for one ontology prefix.

    Returns (identifier, stanza_text), stanza-internal lines in the
    reference's tag order (id, name, def, alt_id, synonym, xref, is_a,
    relationship, is_obsolete), each multi-valued tag sorted."""
    up = _preferred_case(prefix)

    def tagged(df, order, line_col):
        return df.select(
            F.col("identifier"),
            F.lit(order).cast("double").alias("tag_order"),
            line_col.alias("line"),
        )

    t = terms.where(F.col("prefix") == prefix)
    lines = tagged(
        t, 0, F.concat(F.lit("id: " + up + ":"), F.col("identifier"))
    )
    lines = lines.unionByName(
        tagged(
            t.where(F.col("name").isNotNull()),
            1,
            F.concat(F.lit("name: "), F.col("name")),
        )
    )
    lines = lines.unionByName(
        tagged(
            t.where(F.col("definition").isNotNull()),
            2,
            F.concat(F.lit('def: "'), _esc(F.col("definition")), F.lit('" []')),
        )
    )
    lines = lines.unionByName(
        tagged(
            alts.where(F.col("prefix") == prefix),
            3,
            F.concat(F.lit("alt_id: " + up + ":"), F.col("alt_id")),
        )
    )
    spec_map = F.create_map(
        *[F.lit(x) for kv in PREDICATE_TO_SPEC.items() for x in kv]
    )
    syn = synonyms.where(F.col("prefix") == prefix)
    syn_line = F.concat(
        F.lit('synonym: "'),
        _esc(F.col("text")),
        F.lit('" '),
        F.coalesce(spec_map[F.col("predicate")], F.lit("EXACT")),
        F.when(
            F.col("type").isNotNull(), F.concat(F.lit(" "), F.col("type"))
        ).otherwise(F.lit("")),
        F.lit(" ["),
        F.when(
            F.col("provenance").isNotNull(),
            F.array_join(F.col("provenance"), ", "),
        ).otherwise(F.lit("")),
        F.lit("]"),
    )
    lines = lines.unionByName(tagged(syn, 4, syn_line))
    xr = xrefs.where(
        (F.col("prefix") == prefix)
        & (F.col("predicate") == "oboInOwl:hasDbXref")
    )
    lines = lines.unionByName(
        tagged(
            xr,
            5,
            F.concat(
                F.lit("xref: "), _pc(F.col("target_prefix")), F.lit(":"),
                F.col("target_id"),
            ),
        )
    )
    lines = lines.unionByName(
        tagged(
            parents.where(F.col("child_prefix") == prefix)
            .withColumnRenamed("child", "identifier"),
            6,
            # parent keeps its own prefix (may be foreign via macros)
            F.concat(
                F.lit("is_a: "), _pc(F.col("parent_prefix")),
                F.lit(":"), F.col("parent"),
            ),
        )
    )
    rel = relations.where(F.col("prefix") == prefix)
    lines = lines.unionByName(
        tagged(
            rel,
            7,
            F.concat(
                F.lit("relationship: "),
                F.col("relation_prefix"), F.lit(":"), F.col("relation_id"),
                F.lit(" "),
                _pc(F.col("target_prefix")), F.lit(":"), F.col("target_id"),
            ),
        )
    )
    lines = lines.unionByName(
        tagged(
            t.where(F.col("is_obsolete")), 8, F.lit("is_obsolete: true")
        )
    )
    # optional stanza families (struct.py iterate_obo_lines order:
    # subset after alt_id, intersection_of after is_a, replaced_by /
    # consider after is_obsolete)
    if subsets is not None:
        lines = lines.unionByName(
            tagged(
                subsets.where(F.col("prefix") == prefix),
                3.7,
                F.concat(F.lit("subset: "), F.col("subset")),
            )
        )
    if intersections is not None:
        ix = intersections.where(F.col("prefix") == prefix)
        # genus legs carry NO relation at all; an ungrounded differentia
        # label still has relation_id set
        genus = (
            (F.col("relation_prefix").isNull())
            | (F.col("relation_prefix") == "")
        ) & (
            (F.col("relation_id").isNull()) | (F.col("relation_id") == "")
        )
        lines = lines.unionByName(
            tagged(
                ix,
                6.3,
                F.concat(
                    F.lit("intersection_of: "),
                    F.when(
                        genus, F.lit("")
                    ).otherwise(
                        F.concat(
                            F.when(
                                F.col("relation_id").contains(":")
                                | (F.col("relation_prefix") == "")
                                # ungrounded bare labels are stored as
                                # (label, label) — emit the label once
                                | (F.col("relation_prefix")
                                   == F.col("relation_id")),
                                F.col("relation_id"),
                            ).otherwise(
                                F.concat(
                                    "relation_prefix", F.lit(":"),
                                    "relation_id",
                                )
                            ),
                            F.lit(" "),
                        )
                    ),
                    _pc(F.col("target_prefix")), F.lit(":"),
                    F.col("target_id"),
                ),
            )
        )
    if disjoints is not None:
        lines = lines.unionByName(
            tagged(
                disjoints.where(F.col("prefix") == prefix),
                # reference tag order: intersection_of(14) <
                # equivalent_to(16) < disjoint_from(17) < relationship(18)
                6.8,
                F.concat(
                    F.lit("disjoint_from: "),
                    _pc(F.col("target_prefix")), F.lit(":"),
                    F.col("target_id"),
                ),
            )
        )
    if replaced_by is not None:
        lines = lines.unionByName(
            tagged(
                replaced_by.where(F.col("prefix") == prefix),
                8.5,
                F.concat(
                    F.lit("replaced_by: "),
                    _pc(F.col("replacement_prefix")), F.lit(":"),
                    F.col("replacement_id"),
                ),
            )
        )
    if considers is not None:
        lines = lines.unionByName(
            tagged(
                considers.where(F.col("prefix") == prefix),
                8.7,
                F.concat(
                    F.lit("consider: "),
                    _pc(F.col("consider_prefix")), F.lit(":"),
                    F.col("consider_id"),
                ),
            )
        )
    stanza = (
        lines.groupBy("identifier")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(tag_order, line))),"
                       " p -> p.line)"),
                "\n",
            ).alias("body")
        )
        .select(
            "identifier",
            F.concat(F.lit("[Term]\n"), F.col("body")).alias("stanza_text"),
        )
    )
    return stanza


def obo_document(stanzas: DataFrame, prefix: str, version: str = "1") -> str:
    """Assemble the full OBO document string (driver-side — ontology
    serializations are small relative to the corpus). Stanzas globally
    sorted by identifier = the reference's deterministic-output contract
    (utils/io.py:134).

    Bound: this collects ONE ontology's stanzas to the driver — the
    largest real OBO documents are ~10^6 stanzas / low-GB text, inside
    driver memory. It is never applied to the corpus; for bulk export of
    many ontologies, write per-prefix partitioned text via
    `stanzas.write` instead."""
    rows = stanzas.orderBy("identifier").collect()
    header = (
        f"format-version: 1.4\nontology: {prefix}\ndata-version: {version}\n"
    )
    if not rows:
        # header only — keeps byte-identity with write_obo_document,
        # whose header row contributes exactly one trailing newline
        return header
    return header + "\n" + "\n\n".join(r["stanza_text"] for r in rows) + "\n"


def write_obo_document(
    stanzas: DataFrame, path: str, prefix: str, version: str = "1"
) -> None:
    """Distributed OBO text sink — byte-identical to
    :func:`obo_document` but never collects to the driver, so an
    ncbigene-sized ontology (~56.7M terms, reference
    cli/database_utils.py:39) streams straight from executors to disk.

    Mechanics: `write.text` emits each row's `value` followed by one
    newline, so the header row carries the header minus its final
    newline and every stanza row is prefixed with the blank separator
    line. A global `orderBy(ord, identifier)` range-partitions the rows
    in document order; concatenating the part files in filename order
    reproduces the deterministic-output contract (utils/io.py:134)."""
    spark = stanzas.sparkSession
    header = (
        f"format-version: 1.4\nontology: {prefix}\ndata-version: {version}"
    )
    hdr = spark.createDataFrame(
        [(0, "", header)], "ord int, identifier string, value string"
    )
    body = stanzas.select(
        F.lit(1).alias("ord"),
        F.col("identifier"),
        F.concat(F.lit("\n"), F.col("stanza_text")).alias("value"),
    )
    (
        hdr.unionByName(body)
        .orderBy("ord", "identifier")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def obo_typedef_stanzas(typedefs: DataFrame, prefix: str) -> DataFrame:
    """Render [Typedef] stanzas with the OBO 1.4 typedef-only field set
    (struct.py:2254-2318 / TypeDef.iterate_obo_lines). One row per
    typedef: (identifier, stanza_text). Boolean flags are emitted only
    when set; reference CURIEs as-is."""
    # typedef CURIE prefixes are predicate namespaces (BFO/RO/local), so
    # ownership is tracked by the `ontology` column — filter on it when
    # present so a multi-document catalog serializes only the requested
    # document's typedefs
    t = typedefs
    if prefix is not None and "ontology" in typedefs.columns:
        t = typedefs.where(F.col("ontology") == prefix)

    def opt_line(tag, col):
        return F.when(
            F.col(col).isNotNull(),
            F.concat(F.lit(f"\n{tag}: "), F.col(col).cast("string")),
        ).otherwise(F.lit(""))

    def bool_line(tag, col):
        return F.when(
            F.col(col).isNotNull(),
            F.concat(
                F.lit(f"\n{tag}: "),
                F.when(F.col(col), "true").otherwise("false"),
            ),
        ).otherwise(F.lit(""))

    chain_lines = F.when(
        F.col("holds_over_chain").isNotNull()
        & (F.size("holds_over_chain") > 0),
        F.array_join(
            F.transform(
                "holds_over_chain",
                lambda ch: F.concat(
                    F.lit("\nholds_over_chain: "), F.array_join(ch, " ")
                ),
            ),
            "",
        ),
    ).otherwise(F.lit(""))

    def list_lines(tag, col):
        if col not in t.columns:
            return F.lit("")
        return F.when(
            F.col(col).isNotNull() & (F.size(col) > 0),
            F.array_join(
                F.transform(
                    col, lambda x: F.concat(F.lit(f"\n{tag}: "), x)
                ),
                "",
            ),
        ).otherwise(F.lit(""))

    body = F.concat(
        F.lit("[Typedef]\nid: "),
        F.concat("prefix", F.lit(":"), "identifier"),
        opt_line("name", "name"),
        opt_line("namespace", "namespace"),
        F.when(
            F.col("definition").isNotNull(),
            F.concat(
                F.lit('\ndef: "'), _esc(F.col("definition")), F.lit('" []')
            ),
        ).otherwise(F.lit("")),
        opt_line("comment", "comment"),
        list_lines("xref", "xrefs"),
        opt_line("domain", "domain"),
        opt_line("range", "range"),
        list_lines("is_a", "parents"),
        list_lines("equivalent_to", "equivalent_to"),
        list_lines("disjoint_from", "disjoint_from"),
        chain_lines,
        bool_line("is_anti_symmetric", "is_anti_symmetric"),
        bool_line("is_cyclic", "is_cyclic"),
        bool_line("is_reflexive", "is_reflexive"),
        bool_line("is_symmetric", "is_symmetric"),
        bool_line("is_transitive", "is_transitive"),
        bool_line("is_functional", "is_functional"),
        bool_line("is_inverse_functional", "is_inverse_functional"),
        opt_line("inverse_of", "inverse_of"),
        opt_line("transitive_over", "transitive_over"),
        bool_line("is_metadata_tag", "is_metadata_tag"),
        bool_line("is_class_level", "is_class_level"),
        bool_line("is_obsolete", "is_obsolete"),
        list_lines("replaced_by", "replaced_by"),
        list_lines("consider", "consider"),
    )
    return t.select(
        F.col("identifier"),
        body.alias("stanza_text"),
    )
