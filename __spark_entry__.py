"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship KG-construction query over sf0.001: grounds the
                  documents corpus against a broadcast dictionary and
                  materializes (subj, pred, obj) triples unioned with
                  typedef-filtered ontology edges.
queries()       — one callable per implemented SURVEY.md §2 operator.
oracle_sql()    — DuckDB twins (omitted for hash-family/UDF-internal ops,
                  which get rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from pyobo_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: triple materialization over the sf0.001 corpus —
    mention detection (broadcast Aho-Corasick over documents) → best-match
    → mention triples ∪ typedef-filtered ontology edges."""
    sf_dir = "/root/testdata/sf0.001"
    from pyspark.sql import functions as F

    from pyobo_spark.grounding import matcher
    from pyobo_spark.grounding.dictionary import broadcast_matcher, build_matcher

    ac = build_matcher(Q.MENTION_DICT)
    bc = broadcast_matcher(spark, ac)
    raw = matcher.match_text_spans(Q._docs_as_spans(spark, sf_dir), bc)
    best = matcher.best_match(raw)
    mention_triples = best.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("subject_curie"),
        F.lit("pyobo:mentions").alias("predicate_curie"),
        F.col("curie").alias("object_curie"),
    ).distinct()
    onto_edges = Q.q_edges(spark, sf_dir)
    return mention_triples.unionByName(onto_edges)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
