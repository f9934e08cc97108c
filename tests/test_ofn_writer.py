"""OFN (functional OWL) sink — structural assertions against the
reference's axiom families (struct/functional.py:121-193) plus the
distributed write contract."""

from __future__ import annotations

import glob

import pytest

from pyobo_spark.fixtures import generator
from pyobo_spark.operators import ofn_writer


@pytest.fixture(scope="module")
def tables(spark):
    return generator.to_spark(spark, generator.generate(n_terms=20, n_docs=1))


def _doc(tables, **kw):
    return ofn_writer.ofn_document(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        prefix="fixo", **kw,
    )


def test_ofn_axiom_families(spark, tables):
    doc = _doc(tables, version="7")
    assert doc.startswith("Prefix(owl:=<http://www.w3.org/2002/07/owl#>)")
    assert "Ontology(<http://purl.obolibrary.org/obo/fixo.owl>" in doc
    assert doc.rstrip().endswith(")")
    # one Declaration per term
    n_terms = tables["terms"].where("prefix = 'fixo'").count()
    assert doc.count("Declaration(Class(obo:fixo_") == n_terms
    # labels, subclass, relationship nesting, deprecation
    assert "AnnotationAssertion(rdfs:label obo:fixo_" in doc
    assert "SubClassOf(obo:fixo_" in doc
    assert " ObjectSomeValuesFrom(obo:BFO_0000050 " in doc
    n_obs = tables["terms"].where("prefix = 'fixo' and is_obsolete").count()
    assert doc.count('"true"^^xsd:boolean)') == n_obs
    # alt ids point from the ALT to the primary (ReplacedByMacro shape)
    alt = tables["alts"].where("prefix = 'fixo'").first()
    if alt:
        assert (
            f"AnnotationAssertion(obo:IAO_0100001 obo:fixo_{alt['alt_id']} "
            f"obo:fixo_{alt['identifier']})" in doc
        )


def test_ofn_deterministic_and_escaped(spark):
    terms = spark.createDataFrame(
        [("fixo", "0000001", 'na"me\\x', None, False)],
        "prefix string, identifier string, name string, definition string, "
        "is_obsolete boolean",
    )
    empty = lambda ddl: spark.createDataFrame([], ddl)  # noqa: E731
    syn = empty("prefix string, identifier string, text string, predicate string")
    xr = empty(
        "prefix string, identifier string, predicate string, "
        "target_prefix string, target_id string"
    )
    rel = empty(
        "prefix string, identifier string, relation_prefix string, "
        "relation_id string, target_prefix string, target_id string"
    )
    par = empty(
        "child_prefix string, child string, parent_prefix string, parent string"
    )
    alts = empty("prefix string, identifier string, alt_id string")
    mk = lambda: ofn_writer.ofn_document(  # noqa: E731
        terms, syn, xr, rel, par, alts, "fixo"
    )
    d1, d2 = mk(), mk()
    assert d1 == d2
    assert 'rdfs:label obo:fixo_0000001 "na\\"me\\\\x"' in d1


def test_write_ofn_distributed_matches_document(spark, tables, tmp_path):
    want = _doc(tables, version="7")
    out = str(tmp_path / "fixo_ofn")
    ofn_writer.write_ofn(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        "fixo", out, version="7",
    )
    parts = sorted(glob.glob(out + "/part-*"))
    got = "".join(open(p).read() for p in parts)
    assert got == want


def test_ofn_equivalent_and_disjoint_axioms(spark):
    terms = spark.createDataFrame(
        [("fixo", "0000001", "a", None, False)],
        "prefix string, identifier string, name string, definition string, "
        "is_obsolete boolean",
    )
    empty = lambda ddl: spark.createDataFrame([], ddl)  # noqa: E731
    xr = spark.createDataFrame(
        [("fixo", "0000001", "owl:equivalentClass", "chebi", "99")],
        "prefix string, identifier string, predicate string, "
        "target_prefix string, target_id string",
    )
    dj = spark.createDataFrame(
        [("fixo", "0000001", "fixo", "0000002")],
        "prefix string, identifier string, target_prefix string, "
        "target_id string",
    )
    doc = ofn_writer.ofn_document(
        terms,
        empty("prefix string, identifier string, text string, predicate string"),
        xr,
        empty("prefix string, identifier string, relation_prefix string, "
              "relation_id string, target_prefix string, target_id string"),
        empty("child_prefix string, child string, parent_prefix string, "
              "parent string"),
        empty("prefix string, identifier string, alt_id string"),
        "fixo",
        disjoints=dj,
    )
    assert "EquivalentClasses(obo:fixo_0000001 obo:CHEBI_99)" in doc
    assert "DisjointClasses(obo:fixo_0000001 obo:fixo_0000002)" in doc
