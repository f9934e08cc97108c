"""Physical-plan regression guards — the scale properties the engine
promises must survive refactors:
- mention detection is map-only (zero Exchange),
- export scans push filters and prune columns,
- dim joins broadcast (no sort-merge join on the alt-upgrade path).
"""

from __future__ import annotations

from pyobo_spark import queries as Q


def _formatted_plan(df):
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_mention_detection_is_map_only(spark):
    from pyobo_spark.fixtures import generator
    from pyobo_spark.grounding import dictionary, matcher

    tables = generator.to_spark(spark, generator.generate(n_terms=5, n_docs=5))
    bc = spark.sparkContext.broadcast(
        dictionary.build_matcher([("x", "a:1", "rdfs:label")])
    )
    plan = _formatted_plan(matcher.detect_mentions(tables["documents"], bc))
    assert "Exchange" not in plan


def test_names_scan_pushes_filter_and_prunes(spark, sf_dir):
    plan = _formatted_plan(Q.QUERIES["names"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(p_name)]" in plan
    assert "ReadSchema: struct<p_partkey:bigint,p_name:string>" in plan


def test_alt_upgrade_broadcasts(spark, sf_dir):
    plan = _formatted_plan(Q.QUERIES["alt_upgrade"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_typedef_filter_is_broadcast_semi(spark, sf_dir):
    plan = _formatted_plan(Q.QUERIES["relations_typedef_filtered"](spark, sf_dir))
    assert "BroadcastHashJoin LeftSemi" in plan
