"""Distributed SKOS / OBO-Graph sinks round-trip through the engine's
own readers (reference: struct/skos/export.py, struct/obograph/export.py
— serialization parity is checked structurally, not byte-wise, since the
reference serializes via rdflib/pydantic)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pyobo_spark.fixtures import generator
from pyobo_spark.operators import rdf_writers
from pyobo_spark.sources.ntriples import read_ntriples, skos_to_tables
from pyobo_spark.sources.obograph import read_obograph


@pytest.fixture(scope="module")
def tables(spark):
    return generator.to_spark(spark, generator.generate(n_terms=30, n_docs=1))


def test_skos_roundtrip(spark, tables, tmp_path):
    out = str(tmp_path / "fixo_skos")
    rdf_writers.write_skos(
        tables["terms"], tables["synonyms"], tables["parents"], "fixo", out
    )
    got = skos_to_tables(
        read_ntriples(spark, out),
        uri_prefix=rdf_writers.OBO_PURL + "fixo_",
        prefix="fixo",
    )
    want_names = {
        (r["identifier"], r["name"])
        for r in tables["terms"]
        .where("prefix = 'fixo' and name is not null")
        .collect()
    }
    assert {
        (r["identifier"], r["name"]) for r in got["names"].collect()
    } == want_names
    want_syn = {
        (r["identifier"], r["text"])
        for r in tables["synonyms"].where("prefix = 'fixo'").collect()
    }
    assert {
        (r["identifier"], r["text"]) for r in got["synonyms"].collect()
    } == want_syn
    want_par = {
        (r["child"], r["parent"])
        for r in tables["parents"]
        .where("child_prefix = 'fixo' and parent_prefix = 'fixo'")
        .collect()
    }
    got_par = {
        (r["child"], r["parent"]) for r in got["parents"].collect()
    }
    assert want_par <= got_par


def test_skos_no_driver_collect_plan(tables):
    """The triples plan is a union of map-only projections — no
    Exchange (shuffle) anywhere: pure scan → project → union."""
    df = rdf_writers.skos_triples(
        tables["terms"], tables["synonyms"], tables["parents"], "fixo"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_skos_literal_escaping(spark):
    terms = spark.createDataFrame(
        [("fixo", "0000001", 'has "quotes"\nand newline', None, False)],
        "prefix string, identifier string, name string, "
        "definition string, is_obsolete boolean",
    )
    empty_syn = spark.createDataFrame(
        [], "prefix string, identifier string, text string, predicate string"
    )
    empty_par = spark.createDataFrame(
        [],
        "child_prefix string, child string, parent_prefix string, "
        "parent string",
    )
    lines = [
        r["value"]
        for r in rdf_writers.skos_triples(
            terms, empty_syn, empty_par, "fixo"
        ).collect()
    ]
    lab = [ln for ln in lines if "prefLabel" in ln][0]
    assert '\\"quotes\\"' in lab and "\\n" in lab and "\n" not in lab


def test_obograph_roundtrip(spark, tables, tmp_path):
    doc = rdf_writers.obograph_document(
        tables["terms"], tables["parents"], tables["relations"], "fixo"
    )
    p = tmp_path / "fixo.json"
    p.write_text(doc)
    got = read_obograph(spark, str(p))
    n_terms = tables["terms"].where("prefix = 'fixo'").count()
    assert got["nodes"].count() == n_terms
    # node labels match term names
    want = {
        (rdf_writers.OBO_PURL + "fixo_" + r["identifier"], r["name"])
        for r in tables["terms"].where("prefix = 'fixo'").collect()
    }
    assert {
        (r["node_id"], r["label"]) for r in got["nodes"].collect()
    } == want
    # is_a edges present with expanded IRIs
    want_edges = {
        (
            rdf_writers.OBO_PURL + "fixo_" + r["child"],
            "is_a",
            rdf_writers.OBO_PURL + "fixo_" + r["parent"],
        )
        for r in tables["parents"]
        .where("child_prefix = 'fixo' and parent_prefix = 'fixo'")
        .collect()
    }
    got_edges = {
        (r["subject"], r["predicate"], r["object"])
        for r in got["edges"].collect()
    }
    assert want_edges <= got_edges
    # deprecated flag survives in node meta
    parsed = json.loads(doc)
    flags = {n["id"]: n.get("meta", {}).get("deprecated") for n in parsed["graphs"][0]["nodes"]}
    obsolete = {
        rdf_writers.OBO_PURL + "fixo_" + r["identifier"]
        for r in tables["terms"]
        .where("prefix = 'fixo' and is_obsolete").collect()
    }
    assert all(flags[i] for i in obsolete)


def test_obograph_jsonl_distributed(spark, tables, tmp_path):
    out = str(tmp_path / "fixo_og")
    rdf_writers.write_obograph_jsonl(
        tables["terms"], tables["parents"], tables["relations"], "fixo", out
    )
    nodes = spark.read.json(out + "/record_type=node")
    assert nodes.count() == tables["terms"].where("prefix = 'fixo'").count()
    edges = spark.read.json(out + "/record_type=edge")
    assert edges.count() > 0
    assert set(nodes.columns) >= {"id", "lbl", "type"}


def test_skos_backslash_n_literal_roundtrip(spark, tmp_path):
    """A literal backslash followed by 'n' must survive write→read: the
    reader decodes escaped backslashes via a sentinel so sequential
    regexp passes can't turn '\\' + 'n' into a newline (r03 review)."""
    terms = spark.createDataFrame(
        [("fixo", "0000001", "foo\\nbar", "tab\\there", False)],
        "prefix string, identifier string, name string, "
        "definition string, is_obsolete boolean",
    )
    empty_syn = spark.createDataFrame(
        [], "prefix string, identifier string, text string, predicate string"
    )
    empty_par = spark.createDataFrame(
        [],
        "child_prefix string, child string, parent_prefix string, "
        "parent string",
    )
    out = str(tmp_path / "esc_skos")
    rdf_writers.write_skos(terms, empty_syn, empty_par, "fixo", out)
    got = skos_to_tables(
        read_ntriples(spark, out),
        uri_prefix=rdf_writers.OBO_PURL + "fixo_",
        prefix="fixo",
    )
    names = {r["identifier"]: r["name"] for r in got["names"].collect()}
    assert names["0000001"] == "foo\\nbar"


def test_obograph_axiom_families(spark):
    """equivalentNodesSets / domainRangeAxioms / propertyChainAxioms
    (obograph/export.py:83-128)."""
    from pyobo_spark.sources.obo_reader import parse_obo_files

    src = (
        "format-version: 1.4\nontology: tsto\n\n"
        "[Term]\nid: TSTO:0000001\nname: a\nequivalent_to: CHEBI:99\n\n"
        "[Typedef]\nid: BFO:0000050\nname: part of\n"
        "domain: BFO:0000004\nrange: BFO:0000004\n"
        "holds_over_chain: BFO:0000050 BFO:0000050\n"
    )
    t = parse_obo_files(spark, [("tsto", src)])
    doc = rdf_writers.obograph_document(
        t["terms"], t["parents"], t["relations"], "tsto",
        xrefs=t["xrefs"], typedefs=t["typedefs"],
    )
    g = json.loads(doc)["graphs"][0]
    assert g["equivalentNodesSets"] == [
        {"nodeIds": [
            rdf_writers.OBO_PURL + "tsto_0000001",
            rdf_writers.OBO_PURL + "CHEBI_99",
        ]}
    ]
    dr = g["domainRangeAxioms"][0]
    assert dr["predicateId"] == rdf_writers.OBO_PURL + "BFO_0000050"
    # every id field is an IRI — CURIEs next to IRI-keyed nodes break
    # standard obograph consumers
    assert dr["domainClassIds"] == [rdf_writers.OBO_PURL + "BFO_0000004"]
    pc = g["propertyChainAxioms"][0]
    assert pc["chainPredicateIds"] == [
        rdf_writers.OBO_PURL + "BFO_0000050",
        rdf_writers.OBO_PURL + "BFO_0000050",
    ]
    # registered URI prefixes (xsd) expand via the registry, not OBO PURL
    from pyspark.sql import functions as SF

    one = spark.createDataFrame([("xsd:float",)], "c string").select(
        rdf_writers._curie_iri(SF.col("c")).alias("iri")
    ).collect()[0]["iri"]
    assert one == "http://www.w3.org/2001/XMLSchema#float"
    # document path emits the typedef PROPERTY node alongside its axioms
    prop_nodes = [n for n in g["nodes"] if n.get("type") == "PROPERTY"]
    assert prop_nodes and prop_nodes[0]["id"] == (
        rdf_writers.OBO_PURL + "BFO_0000050"
    )


def test_obograph_typedef_property_nodes(spark):
    """Typedefs surface as PROPERTY nodes (test_full.py test_typedef_1)."""
    from pyobo_spark.sources.obo_reader import parse_obo_files

    src = (
        "format-version: 1.4\nontology: tsto\n\n"
        "[Typedef]\nid: BFO:0000050\nname: part of\n"
    )
    t = parse_obo_files(spark, [("tsto", src)])
    recs = rdf_writers.obograph_records(
        t["terms"], t["parents"], t["relations"], "tsto",
        typedefs=t["typedefs"],
    ).collect()
    props = [
        json.loads(r["value"]) for r in recs
        if json.loads(r["value"]).get("type") == "PROPERTY"
    ]
    assert props and props[0]["id"] == rdf_writers.OBO_PURL + "BFO_0000050"
    assert props[0]["lbl"] == "part of"


def test_skos_oracle_escape_chain_matches_engine(spark):
    """The DuckDB oracle's escape chain (queries.SQL_SKOS_TRIPLES) must
    agree with _esc_lit on hostile characters — TPC-H strings contain
    none, so parity alone can't catch a divergence (r03 review)."""
    import duckdb

    hostile = 'a"b\\c\nd\te'
    import re

    from pyobo_spark import queries as Q

    m = re.search(
        r"replace\(replace\(replace\(replace\(coalesce\(name, ''\)"
        r"[^\n]*\n[^\n]*AS name_esc",
        Q.ORACLES["skos_triples"],
    )
    expr = m.group(0).rsplit(" AS ", 1)[0].replace(
        "coalesce(name, '')", "?"
    )
    got = duckdb.connect().execute(f"SELECT {expr}", [hostile]).fetchone()[0]
    want_df = spark.createDataFrame([(hostile,)], "s string").select(
        rdf_writers._esc_lit(F.col("s")).alias("e")
    )
    want = want_df.collect()[0]["e"]
    assert got == want
