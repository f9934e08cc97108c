"""Canonical table schemas (SURVEY.md §1.3).

Derived 1:1 from the reference's cache artifacts
(/root/reference/src/pyobo/utils/path.py:129-152 CacheArtifact;
 /root/reference/src/pyobo/struct/struct.py:1293-1326 _get_cache_config).
All identifier-plane columns are string-typed, matching the reference's
TSV dtype=str convention (src/pyobo/api/relations.py:66-68).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- span struct for the interleaved corpus (BASELINE.json input_hint) ----

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),       # text | image | audio | table
        T.StructField("text", T.StringType()),       # non-empty iff kind='text'
        T.StructField("media_ref", T.StringType()),  # non-empty iff kind!='text'
        T.StructField("offset", T.IntegerType()),    # strictly increasing per doc
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# ---- ontology-plane tables ----

NAMES = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("name", T.StringType()),
    ]
)

DEFINITIONS = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("definition", T.StringType()),
    ]
)

SPECIES = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("taxonomy_id", T.StringType()),
    ]
)

ALTS = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),  # primary
        T.StructField("alt_id", T.StringType(), False),
    ]
)

PARENTS = T.StructType(  # is_a edges; parent may be a foreign reference
    [                     # (reader.py:716 append_parent keeps the full ref)
        T.StructField("child_prefix", T.StringType(), False),
        T.StructField("child", T.StringType(), False),
        T.StructField("parent_prefix", T.StringType(), False),
        T.StructField("parent", T.StringType(), False),
    ]
)

INTERSECTIONS = T.StructType(  # genus-differentia intersection_of legs
    [                          # (struct.py append_intersection_of; a row with
        T.StructField("prefix", T.StringType(), False),      # NULL relation_*
        T.StructField("identifier", T.StringType(), False),  # is the genus)
        T.StructField("relation_prefix", T.StringType()),
        T.StructField("relation_id", T.StringType()),
        T.StructField("target_prefix", T.StringType(), False),
        T.StructField("target_id", T.StringType(), False),
    ]
)

RELATIONS = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("relation_prefix", T.StringType(), False),
        T.StructField("relation_id", T.StringType(), False),
        T.StructField("target_prefix", T.StringType()),
        T.StructField("target_id", T.StringType()),
    ]
)

EDGES = T.StructType(  # reference: struct.py:1843-1846 (:START_ID,:TYPE,:END_ID)
    [
        T.StructField("subject_curie", T.StringType(), False),
        T.StructField("predicate_curie", T.StringType(), False),
        T.StructField("object_curie", T.StringType(), False),
    ]
)

LITERAL_MAPPINGS = T.StructType(  # synonyms+labels; struct_utils.py:1108-1145
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("type", T.StringType()),
        T.StructField("provenance", T.ArrayType(T.StringType())),
        T.StructField("language", T.StringType()),
    ]
)

MAPPINGS = T.StructType(  # SSSOM slice; struct.py:2167-2201
    [
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("predicate_id", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("mapping_justification", T.StringType()),
    ]
)

SEMANTIC_MAPPINGS = T.StructType(  # full SemanticMapping column set
    [                              # (struct.py:2167-2191 get_semantic_mappings)
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("subject_type", T.StringType()),
        T.StructField("predicate_id", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("mapping_justification", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("contributor", T.StringType()),
        T.StructField("mapping_source", T.StringType()),
        T.StructField("subject_source", T.StringType()),
        T.StructField("subject_source_version", T.StringType()),
        T.StructField("license", T.StringType()),
    ]
)

LITERAL_PROPERTIES = T.StructType(  # struct.py:1720-1723
    [
        T.StructField("source_curie", T.StringType(), False),
        T.StructField("predicate_curie", T.StringType(), False),
        T.StructField("value", T.StringType()),
        T.StructField("datatype", T.StringType()),
        T.StructField("language", T.StringType()),
    ]
)

OBJECT_PROPERTIES = T.StructType(  # struct.py:1716-1718
    [
        T.StructField("source_curie", T.StringType(), False),
        T.StructField("predicate_curie", T.StringType(), False),
        T.StructField("target_curie", T.StringType(), False),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("token_start", T.IntegerType(), False),
        T.StructField("token_end", T.IntegerType(), False),
        T.StructField("matched_text", T.StringType(), False),
        T.StructField("curie", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

TRIPLES = EDGES  # (subj, pred, obj) — same shape
