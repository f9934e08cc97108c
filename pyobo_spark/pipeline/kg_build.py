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


def detect_and_upgrade_mentions(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    lm: DataFrame,
    skip_obsolete: bool = True,
) -> DataFrame:
    """Stage body: literal-mappings dictionary → broadcast Aho-Corasick →
    mention detection → alt-id canonicalization (broadcast join)."""
    obsolete = exports.obsoletes(tables["terms"]) if skip_obsolete else None
    entries = dictionary.dictionary_entries(lm, skip_obsolete_df=obsolete)
    ac = dictionary.build_matcher(entries)
    bc = dictionary.broadcast_matcher(spark, ac)

    mentions = matcher.detect_mentions(tables["documents"], bc)

    alt_map = tables["alts"].select(
        F.concat("prefix", F.lit(":"), "alt_id").alias("alt_curie"),
        F.concat("prefix", F.lit(":"), "identifier").alias("primary_curie"),
    )
    return (
        mentions.join(
            F.broadcast(alt_map), mentions.curie == alt_map.alt_curie, "left"
        )
        .withColumn("curie", F.coalesce("primary_curie", "curie"))
        .drop("alt_curie", "primary_curie")
    )


def parsed_xrefs(tables: dict[str, DataFrame]) -> DataFrame:
    """Stage body: normalize xref target curies through the identifier
    kernel (identifier_utils semantics). Returns EVERY row with its
    ``parse_status`` — bad-status rows stay present here so one
    snapshot carries both the equivalence-graph input and the lineage
    evidence (the reference's counter-logged warnings,
    reference.py:213-258)."""
    xr_raw = tables["xrefs"].select(
        F.col("prefix").alias("subj_prefix"),
        F.col("identifier").alias("subj_identifier"),
        "predicate",
        F.concat("target_prefix", F.lit(":"), "target_id").alias("target_curie"),
    )
    return normalize_curies(xr_raw, "target_curie")


def ok_xrefs(parsed: DataFrame) -> DataFrame:
    """Bad-status rows are EXCLUDED from the equivalence graph."""
    return parsed.where(F.col("parse_status") == "ok").select(
        "subj_prefix",
        "subj_identifier",
        "predicate",
        F.col("prefix").alias("target_prefix"),
        F.col("identifier").alias("target_id"),
    )


def normalized_xrefs(tables: dict[str, DataFrame]) -> tuple[DataFrame, DataFrame]:
    """(ok_xrefs, parse_lineage) — the one-shot pipeline's view."""
    parsed = parsed_xrefs(tables)
    return ok_xrefs(parsed), parse_metrics(parsed)


def xref_components(xr: DataFrame) -> DataFrame:
    """Stage body: xref equivalence graph → connected components."""
    cc_edges = xr.select(
        F.concat("subj_prefix", F.lit(":"), "subj_identifier").alias("src"),
        F.concat("target_prefix", F.lit(":"), "target_id").alias("dst"),
    )
    return components.connected_components(cc_edges)


def canonicalize_mentions(mentions: DataFrame, comp: DataFrame) -> DataFrame:
    """Stage body: rewrite mention curies to their component canonical.

    NO broadcast hint here: the component map covers every curie in the
    xref graph (~10^7-10^8 rows across all of OBO) — broadcasting it is
    a driver/executor-memory risk at scale. A shuffle join on curie is
    bounded and AQE will still downgrade to broadcast when the map is
    actually small (as in tests)."""
    comp_map = comp.select(F.col("curie").alias("m_curie"), "component")
    return (
        mentions.join(comp_map, mentions.curie == comp_map.m_curie, "left")
        .withColumn("canonical", F.coalesce("component", "curie"))
        .drop("m_curie", "component")
    )


def build_triples(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    mentions_canonical: DataFrame,
    prefix: str = "fixo",
) -> DataFrame:
    """Stage body: mention triples ∪ typedef-filtered ontology edges."""
    typedefs = spark.createDataFrame(
        [(p, i) for p, i, _ in exports.DEFAULT_TYPEDEFS],
        "typedef_prefix string, typedef_id string",
    )
    rel_ok = exports.relations_typedef_filtered(tables["relations"], typedefs)
    onto_edges = exports.edges(rel_ok, tables["parents"], prefix=prefix)
    mention_triples = mentions_canonical.select(
        F.concat(F.lit("doc:"), "doc_id").alias("subject_curie"),
        F.lit("pyobo:mentions").alias("predicate_curie"),
        F.col("canonical").alias("object_curie"),
    ).distinct()
    return mention_triples.unionByName(onto_edges)


def run_kg_pipeline(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    skip_obsolete: bool = True,
) -> dict[str, DataFrame]:
    """tables: fixture dict from fixtures.generator.to_spark. Returns the
    materialized output DataFrames."""
    terms = tables["terms"]
    lm = build_literal_mappings(terms, tables["synonyms"])
    mentions = detect_and_upgrade_mentions(
        spark, tables, lm, skip_obsolete=skip_obsolete
    )

    xr, parse_lineage = normalized_xrefs(tables)
    comp = xref_components(xr)
    mentions = canonicalize_mentions(mentions, comp)
    triples = build_triples(spark, tables, mentions)

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


def run_kg_pipeline_staged(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    root: str,
    skip_obsolete: bool = True,
    force: bool = False,
    snapshot_table: str | None = None,
    _fail_before: str | None = None,
) -> "PipelineRunner":
    """The KG pipeline as five checkpointed PipelineRunner stages —
    restartable mid-flight, the reference's resumability model
    (per-artifact ``is_file()`` checks, struct.py:1354,
    getters.py:166-176) as commit-then-mark parquet snapshots:

      1. literal_mappings   2. mentions (detect + alt upgrade)
      3. xrefs_parsed       4. components
      5. triples (canonicalize + edge union)

    Stage 3 snapshots the FULL parse output (every xref row with its
    parse_status) and its manifest counts rows per status, so one
    snapshot carries both the equivalence-graph input (stage 4 filters
    ok rows FROM THE SNAPSHOT — the parse runs once, and a crash
    between stages 3 and 4 cannot drift: components are built from the
    same bytes the lineage counters describe) and the observability the
    one-shot pipeline returns as parse_lineage (the reference's
    counter-logged warnings, reference.py:213-258).

    A stage whose manifest exists is skipped on re-run and its output is
    read back from its parquet snapshot, so downstream stages consume
    the SAME bytes an uninterrupted run would have (no recompute drift).
    Every inter-stage input goes through the snapshot: a restarted
    process reconstructs nothing from memory.

    ``snapshot_table``: when set, every run that actually REBUILDS the
    triples stage (not a skipped resume) also commits the triples into
    an Iceberg-style :class:`~pyobo_spark.pipeline.snapshots.SnapshotTable`
    at that root — each pipeline run becomes one immutable snapshot, so
    downstream consumers get time travel across runs and a rollback
    path when a bad build ships (the north rule's "Iceberg-snapshot
    checkpoints" as the output contract, not just the resume contract).
    The commit is recorded in a ``_SNAPSHOT_ID`` marker next to the
    stage manifest, so a crash between the stage's manifest commit and
    the snapshot commit is healed on resume (the skipped stage's bytes
    are committed then) instead of skipping the snapshot forever.

    ``_fail_before`` simulates a crash (test hook): raise just before
    the named stage, AFTER earlier stages committed.
    """
    from .stages import PipelineRunner

    runner = PipelineRunner(spark, root, force=force)

    def gate(name: str) -> None:
        if _fail_before == name:
            raise RuntimeError(f"simulated crash before stage {name!r}")

    gate("literal_mappings")
    lm = runner.stage(
        "literal_mappings",
        lambda: build_literal_mappings(tables["terms"], tables["synonyms"]),
        counter_cols=("predicate",),
    )
    gate("mentions")
    mentions = runner.stage(
        "mentions",
        lambda: detect_and_upgrade_mentions(
            spark, tables, lm, skip_obsolete=skip_obsolete
        ),
        counter_cols=("curie",),
    )
    gate("xrefs_parsed")
    parsed = runner.stage(
        "xrefs_parsed",
        lambda: parsed_xrefs(tables),
        counter_cols=("parse_status",),
    )
    gate("components")
    comp = runner.stage(
        "components",
        lambda: xref_components(ok_xrefs(parsed)),
    )
    gate("triples")
    triples = runner.stage(
        "triples",
        lambda: build_triples(
            spark, tables, canonicalize_mentions(mentions, comp)
        ),
        counter_cols=("predicate_curie",),
    )
    if snapshot_table is not None:
        _commit_triples_snapshot(
            spark, triples, root, snapshot_table,
            rebuilt=not runner.results[-1].skipped,
        )
    return runner


def _commit_triples_snapshot(
    spark, triples, root: str, snapshot_table: str, rebuilt: bool
) -> None:
    """Commit the triples stage's bytes as one SnapshotTable snapshot,
    at most once per rebuild. The marker is written AFTER the snapshot
    commit, so the crash cases resolve to: crash before the snapshot →
    resume recommits (marker absent); crash between snapshot and marker
    → resume commits a duplicate snapshot of identical content (benign
    — snapshots are cheap and immutable) rather than ever LOSING one."""
    from pathlib import Path

    from .snapshots import SnapshotTable

    marker = Path(root) / "triples" / "_SNAPSHOT_ID"
    if not rebuilt and marker.exists():
        return
    sid = SnapshotTable(spark, snapshot_table).overwrite(triples)
    marker.write_text(str(sid))
