"""to_obonet-style full-graph export (reference struct.py:1521-1589)."""

from __future__ import annotations

import json

import pytest

from pyobo_spark.fixtures import generator
from pyobo_spark.operators import obonet_export


@pytest.fixture(scope="module")
def tables(spark):
    return generator.to_spark(spark, generator.generate(n_terms=25, n_docs=1))


def test_obonet_nodes_shape(spark, tables):
    nodes = obonet_export.obonet_nodes(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], "fixo",
    ).collect()
    assert len(nodes) == tables["terms"].where("prefix = 'fixo'").count()
    d = {r["curie"]: json.loads(r["node_json"]) for r in nodes}
    some = d["fixo:0000001"]
    assert some["id"] == "fixo:0000001"
    assert some["name"] == generator._label(1)
    # multi-valued families are sorted lists; absent families are dropped
    for rec in d.values():
        for fam in ("xref", "is_a", "relationship", "synonym"):
            if fam in rec:
                assert rec[fam] == sorted(rec[fam]) and rec[fam]


def test_obonet_links_match_tables(spark, tables):
    links = obonet_export.obonet_links(
        tables["relations"], tables["parents"], "fixo"
    ).collect()
    got = {(r["source"], r["key"], r["target"]) for r in links}
    want_isa = {
        (f"fixo:{r['child']}", "is_a", f"fixo:{r['parent']}")
        for r in tables["parents"].where("child_prefix = 'fixo'").collect()
    }
    assert want_isa <= got
    want_rel = {
        (
            f"fixo:{r['identifier']}",
            f"{r['relation_prefix']}:{r['relation_id']}",
            f"{r['target_prefix']}:{r['target_id']}",
        )
        for r in tables["relations"].where("prefix = 'fixo'").collect()
    }
    assert want_rel <= got
    assert got == want_isa | want_rel


def test_node_link_document_roundtrips_networkx_shape(spark, tables):
    doc = obonet_export.node_link_document(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], "fixo", version="7",
    )
    assert doc["directed"] and doc["multigraph"]
    assert doc["graph"]["ontology"] == "fixo"
    assert doc["graph"]["data-version"] == "7"
    ids = [n["id"] for n in doc["nodes"]]
    assert ids == sorted(ids)
    # every link endpoint with a fixo prefix is a known node
    node_set = set(ids)
    for link in doc["links"]:
        if link["source"].startswith("fixo:"):
            assert link["source"] in node_set
