"""Obonet-style full-graph export — the reference's ``to_obonet``
(``struct.py:1521-1589``: a networkx MultiDiGraph with one node dict per
stanza — id/name/def/xref/is_a/relationship/synonym — and (u, key, v)
links) re-expressed as two DataFrames plus a bounded node-link JSON
document.

Spark-first: the reference iterates stanzas on the driver; here each
node's multi-valued families are per-key ``sort_array(collect_list(...))``
aggregations (map-side combine, one shuffle keyed by term) and the link
list is a map-only union — both stream to JSON-lines at any ontology
size. The networkx object itself is driver-side by nature; callers that
need it feed ``node_link_document`` to ``networkx.node_link_graph``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _curie(prefix_col, id_col):
    return F.concat_ws(":", prefix_col, id_col)


def obonet_nodes(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    prefix: str,
) -> DataFrame:
    """(curie, node_json) — one obonet node dict per term, empty-valued
    keys dropped like the reference's ``{k: v for ... if v}``."""
    t = terms.where(F.col("prefix") == prefix)
    key = _curie(F.col("prefix"), F.col("identifier")).alias("curie")

    def fam(df, expr, name, key_col=None):
        k = key_col if key_col is not None else key
        return (
            df.select(k, expr.alias("v"))
            .groupBy("curie")
            .agg(F.sort_array(F.collect_list("v")).alias(name))
        )

    xr = fam(
        xrefs.where(
            (F.col("prefix") == prefix)
            & (F.col("predicate") == "oboInOwl:hasDbXref")
        ),
        _curie(F.col("target_prefix"), F.col("target_id")),
        "xref",
    )
    isa = fam(
        parents.where(F.col("child_prefix") == prefix),
        _curie(F.col("parent_prefix"), F.col("parent")),
        "is_a",
        key_col=_curie(F.col("child_prefix"), F.col("child")).alias("curie"),
    )
    rel = fam(
        relations.where(F.col("prefix") == prefix),
        F.concat(
            _curie(F.col("relation_prefix"), F.col("relation_id")),
            F.lit(" "),
            _curie(F.col("target_prefix"), F.col("target_id")),
        ),
        "relationship",
    )
    syn = fam(
        synonyms.where(F.col("prefix") == prefix),
        F.col("text"),
        "synonym",
    )
    base = t.select(
        key,
        F.col("name"),
        F.col("definition").alias("def"),
    )
    node = (
        base.join(xr, on="curie", how="left")
        .join(isa, on="curie", how="left")
        .join(rel, on="curie", how="left")
        .join(syn, on="curie", how="left")
    )
    # to_json drops nulls, matching the reference's falsy-key filter
    return node.select(
        "curie",
        F.to_json(
            F.struct(
                F.col("curie").alias("id"),
                "name",
                "def",
                "xref",
                "is_a",
                "relationship",
                "synonym",
            ),
            {"ignoreNullFields": "true"},
        ).alias("node_json"),
    )


def obonet_links(
    relations: DataFrame, parents: DataFrame, prefix: str
) -> DataFrame:
    """(source, key, target) MultiDiGraph links: is_a edges plus one per
    relationship (struct.py:1550-1561)."""
    isa = parents.where(F.col("child_prefix") == prefix).select(
        _curie(F.col("child_prefix"), F.col("child")).alias("source"),
        F.lit("is_a").alias("key"),
        _curie(F.col("parent_prefix"), F.col("parent")).alias("target"),
    )
    rel = relations.where(F.col("prefix") == prefix).select(
        _curie(F.col("prefix"), F.col("identifier")).alias("source"),
        _curie(F.col("relation_prefix"), F.col("relation_id")).alias("key"),
        _curie(F.col("target_prefix"), F.col("target_id")).alias("target"),
    )
    return isa.unionByName(rel)


def node_link_document(
    terms: DataFrame,
    synonyms: DataFrame,
    xrefs: DataFrame,
    relations: DataFrame,
    parents: DataFrame,
    prefix: str,
    version: str | None = None,
) -> dict:
    """Bounded driver assembly of the networkx node-link dict
    (``nx.node_link_graph``-compatible; same contract note as
    obo_writer.obo_document). Graph metadata mirrors
    struct.py:1524-1538."""
    nodes = [
        json.loads(r["node_json"])
        for r in obonet_nodes(
            terms, synonyms, xrefs, relations, parents, prefix
        )
        .orderBy("curie")
        .collect()
    ]
    links = [
        {"source": r["source"], "key": r["key"], "target": r["target"]}
        for r in obonet_links(relations, parents, prefix)
        .orderBy("source", "key", "target")
        .collect()
    ]
    return {
        "directed": True,
        "multigraph": True,
        "graph": {
            "ontology": prefix,
            "format-version": "1.4",
            "data-version": version,
        },
        "nodes": nodes,
        "links": links,
    }
