"""End-to-end KG construction — the north-rule pipeline (SURVEY.md §3.2):

  fixture ontology tables → literal_mappings dictionary (labels +
  synonyms, skip_obsolete anti-join) → broadcast Aho-Corasick →
  documents(doc_id, spans[]) → posexplode → Arrow matcher → best-match →
  alt-id canonicalization (broadcast join) → xref connected components →
  component-canonical CURIEs → (subj, pred, obj) triples ∪ ontology
  edges, plus names/synonyms/mappings side tables.

Each stage is checkpointable via PipelineRunner (resume-from-stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grounding import dictionary, matcher
from ..normalize.curie import normalize_curies, parse_metrics
from ..operators import components, exports


def build_literal_mappings(terms: DataFrame, synonyms: DataFrame) -> DataFrame:
    """labels (rdfs:label, struct_utils.py:1108-1119) ∪ synonym rows."""
    labels = terms.where(F.col("name").isNotNull()).select(
        "prefix",
        "identifier",
        F.col("name").alias("text"),
        F.lit("rdfs:label").alias("predicate"),
        F.lit(None).cast("string").alias("type"),
        F.lit(None).cast("array<string>").alias("provenance"),
        F.lit(None).cast("string").alias("language"),
    )
    return labels.unionByName(
        synonyms.select(
            "prefix", "identifier", "text", "predicate", "type",
            "provenance", "language",
        )
    )


def run_kg_pipeline(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    skip_obsolete: bool = True,
) -> dict[str, DataFrame]:
    """tables: fixture dict from fixtures.generator.to_spark. Returns the
    materialized output DataFrames."""
    terms = tables["terms"]
    lm = build_literal_mappings(terms, tables["synonyms"])

    obsolete = exports.obsoletes(terms) if skip_obsolete else None
    entries = dictionary.dictionary_entries(lm, skip_obsolete_df=obsolete)
    ac = dictionary.build_matcher(entries)
    bc = dictionary.broadcast_matcher(spark, ac)

    mentions = matcher.detect_mentions(tables["documents"], bc)

    # canonicalize: alt-id upgrade (broadcast) on the mention curie
    alts = tables["alts"]
    alt_map = alts.select(
        F.concat("prefix", F.lit(":"), "alt_id").alias("alt_curie"),
        F.concat("prefix", F.lit(":"), "identifier").alias("primary_curie"),
    )
    mentions = (
        mentions.join(
            F.broadcast(alt_map), mentions.curie == alt_map.alt_curie, "left"
        )
        .withColumn("curie", F.coalesce("primary_curie", "curie"))
        .drop("alt_curie", "primary_curie")
    )

    # normalize xref target curies through the identifier kernel
    # (identifier_utils semantics): bad-status rows are EXCLUDED from the
    # equivalence graph and surfaced in parse-status lineage counters
    # (the reference's counter-logged warnings, reference.py:213-258)
    xr_raw = tables["xrefs"].select(
        F.col("prefix").alias("subj_prefix"),
        F.col("identifier").alias("subj_identifier"),
        "predicate",
        F.concat("target_prefix", F.lit(":"), "target_id").alias("target_curie"),
    )
    xr_parsed = normalize_curies(xr_raw, "target_curie")
    parse_lineage = parse_metrics(xr_parsed)
    xr = xr_parsed.where(F.col("parse_status") == "ok").select(
        "subj_prefix",
        "subj_identifier",
        "predicate",
        F.col("prefix").alias("target_prefix"),
        F.col("identifier").alias("target_id"),
    )
    cc_edges = xr.select(
        F.concat("subj_prefix", F.lit(":"), "subj_identifier").alias("src"),
        F.concat("target_prefix", F.lit(":"), "target_id").alias("dst"),
    )
    comp = components.connected_components(cc_edges)
    comp_map = comp.select(F.col("curie").alias("m_curie"), "component")
    # NO broadcast hint here: comp_map covers every curie in the xref
    # graph (~10^7-10^8 rows across all of OBO) — broadcasting it is a
    # driver/executor-memory risk at scale. A shuffle join on curie is
    # bounded and AQE will still downgrade to broadcast when the map is
    # actually small (as in tests).
    mentions = (
        mentions.join(comp_map, mentions.curie == comp_map.m_curie, "left")
        .withColumn("canonical", F.coalesce("component", "curie"))
        .drop("m_curie", "component")
    )

    # triples: mention triples ∪ ontology edges
    typedefs = spark.createDataFrame(
        [(p, i) for p, i, _ in exports.DEFAULT_TYPEDEFS],
        "typedef_prefix string, typedef_id string",
    )
    rel_ok = exports.relations_typedef_filtered(tables["relations"], typedefs)
    onto_edges = exports.edges(rel_ok, tables["parents"], prefix="fixo")
    mention_triples = mentions.select(
        F.concat(F.lit("doc:"), "doc_id").alias("subject_curie"),
        F.lit("pyobo:mentions").alias("predicate_curie"),
        F.col("canonical").alias("object_curie"),
    ).distinct()
    triples = mention_triples.unionByName(onto_edges)

    # multimodal leg: non-text spans → media-table skeleton + (stubbed)
    # feature extraction — the media plumbing runs in the same pipeline
    from ..operators import multimodal

    media = multimodal.media_from_documents(
        matcher.explode_spans(tables["documents"])
    )
    media_features = multimodal.extract_media_features(media)

    return {
        "literal_mappings": lm,
        "mentions": mentions,
        "components": comp,
        "media_features": media_features,
        "names": exports.names(terms),
        "mappings": xr.select(
            F.concat("subj_prefix", F.lit(":"), "subj_identifier").alias(
                "subject_id"
            ),
            F.col("predicate").alias("predicate_id"),
            F.concat("target_prefix", F.lit(":"), "target_id").alias("object_id"),
        ).dropDuplicates(),
        "parse_lineage": parse_lineage,
        "triples": triples,
    }
