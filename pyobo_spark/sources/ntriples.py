"""N-Triples RDF reader — distributed via spark.read.text (the format is
line-oriented, so it splits perfectly across executors; this is the
Spark-native ingest for RDF dumps where the reference shells out to
driver-side rdflib for SKOS/RDF, getters.py:195-201 — works at any file
size because no line depends on another).

Grammar (W3C N-Triples): `<subj> <pred> <obj> .` or literal objects
`"value"^^<datatype>` / `"value"@lang`. Comments (#) and blank lines
skipped. Malformed lines are routed to a status column, not dropped
silently (counter-logged like the reference's parse warnings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# <s> <p> <o> .          |  <s> <p> "lit"(^^<dt> | @lang)? .
_URI = r"<([^>]*)>"
_TRIPLE_URI = rf"^\s*{_URI}\s+{_URI}\s+{_URI}\s*\.\s*$"
_TRIPLE_LIT = (
    rf'^\s*{_URI}\s+{_URI}\s+"((?:[^"\\]|\\.)*)"'
    rf"(?:\^\^{_URI}|@([A-Za-z0-9-]+))?\s*\.\s*$"
)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Returns (subject, predicate, object, is_literal, datatype,
    language, parse_status). object holds the URI or the literal value."""
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    body = lines.where(
        (F.trim("line") != "") & ~F.trim(F.col("line")).startswith("#")
    )
    s_uri = F.regexp_extract("line", _TRIPLE_URI, 1)
    parsed = body.select(
        "line",
        F.regexp_extract("line", _TRIPLE_URI, 1).alias("u_s"),
        F.regexp_extract("line", _TRIPLE_URI, 2).alias("u_p"),
        F.regexp_extract("line", _TRIPLE_URI, 3).alias("u_o"),
        F.regexp_extract("line", _TRIPLE_LIT, 1).alias("l_s"),
        F.regexp_extract("line", _TRIPLE_LIT, 2).alias("l_p"),
        F.regexp_extract("line", _TRIPLE_LIT, 3).alias("l_v"),
        F.regexp_extract("line", _TRIPLE_LIT, 4).alias("l_dt"),
        F.regexp_extract("line", _TRIPLE_LIT, 5).alias("l_lang"),
    )
    is_uri = F.col("u_s") != ""
    is_lit = (F.col("l_s") != "") & ~is_uri
    # N-Triples string-escape decoding for literal values (\" \n \t \\).
    # Escaped backslashes are swapped to a sentinel FIRST: sequential
    # regexp passes would otherwise mis-decode a literal backslash
    # followed by 'n'/'t' ('foo\\nbar' on the wire means backslash+n,
    # but a later \n pass would see the second backslash and emit a
    # newline). \x00 cannot appear in a valid N-Triples literal.
    lit_val = F.col("l_v")
    for pat, rep in ((r"\\\\", "\x00"), (r'\\"', '"'), (r"\\n", "\n"),
                     (r"\\t", "\t"), ("\x00", "\\\\")):
        lit_val = F.regexp_replace(lit_val, pat, rep)
    return parsed.select(
        F.when(is_uri, F.col("u_s")).when(is_lit, F.col("l_s")).alias("subject"),
        F.when(is_uri, F.col("u_p")).when(is_lit, F.col("l_p")).alias("predicate"),
        F.when(is_uri, F.col("u_o")).when(is_lit, lit_val).alias("object"),
        is_lit.alias("is_literal"),
        F.when(is_lit & (F.col("l_dt") != ""), F.col("l_dt")).alias("datatype"),
        F.when(is_lit & (F.col("l_lang") != ""), F.col("l_lang")).alias("language"),
        F.when(is_uri | is_lit, F.lit("ok")).otherwise(F.lit("malformed")).alias(
            "parse_status"
        ),
    )


SKOS = "http://www.w3.org/2004/02/skos/core#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"


def skos_to_tables(triples: DataFrame, uri_prefix: str, prefix: str) -> dict:
    """SKOS concept scheme → names + synonyms + broader-hierarchy tables
    (reference: struct/skos reader semantics — prefLabel=name,
    altLabel=synonym, broader=is_a-like edge)."""
    ok = triples.where(F.col("parse_status") == "ok")
    strip = lambda c: F.regexp_replace(c, f"^{uri_prefix}", "")  # noqa: E731
    in_scheme = F.col("subject").startswith(uri_prefix)
    names = ok.where(
        in_scheme & (F.col("predicate") == SKOS + "prefLabel")
    ).select(
        F.lit(prefix).alias("prefix"),
        strip(F.col("subject")).alias("identifier"),
        F.col("object").alias("name"),
    )
    synonyms = ok.where(
        in_scheme & (F.col("predicate") == SKOS + "altLabel")
    ).select(
        F.lit(prefix).alias("prefix"),
        strip(F.col("subject")).alias("identifier"),
        F.col("object").alias("text"),
        F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
    )
    parents = ok.where(
        # skos:broader (plain SKOS data) or skos:broadMatch (what the
        # reference's own SKOS export emits, skos/export.py:101)
        in_scheme
        & F.col("predicate").isin(SKOS + "broader", SKOS + "broadMatch")
    ).select(
        F.lit(prefix).alias("child_prefix"),
        strip(F.col("subject")).alias("child"),
        F.lit(prefix).alias("parent_prefix"),
        strip(F.col("object")).alias("parent"),
    )
    return {"names": names, "synonyms": synonyms, "parents": parents}
