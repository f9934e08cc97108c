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
) -> DataFrame:
    """Render [Term] stanzas for one ontology prefix.

    Returns (identifier, stanza_text), stanza-internal lines in the
    reference's tag order (id, name, def, alt_id, synonym, xref, is_a,
    relationship, is_obsolete), each multi-valued tag sorted."""
    up = prefix.upper()

    def tagged(df, order, line_col):
        return df.select(
            F.col("identifier"),
            F.lit(order).alias("tag_order"),
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
                F.lit("xref: "), F.col("target_prefix"), F.lit(":"),
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
                F.lit("is_a: "), F.upper(F.col("parent_prefix")),
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
                F.upper(F.col("target_prefix")), F.lit(":"), F.col("target_id"),
            ),
        )
    )
    lines = lines.unionByName(
        tagged(
            t.where(F.col("is_obsolete")), 8, F.lit("is_obsolete: true")
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
    return header + "\n" + "\n\n".join(r["stanza_text"] for r in rows) + "\n"
