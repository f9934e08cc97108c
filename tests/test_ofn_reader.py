"""OFN (functional OWL) source — round-trip parity with the OFN sink.

The reference only reads OWL through the external ROBOT tool
(getters.py); read_ofn covers the functional-syntax axiom subset the
engine itself emits, so write_ofn -> read_ofn must reproduce the input
long tables exactly (modulo prefix case, lowercased on ingest, and the
writer's deliberate drops: rdfs:label-predicate synonym rows).
"""

from __future__ import annotations

import pytest

from pyobo_spark.fixtures import generator
from pyobo_spark.operators import ofn_writer
from pyobo_spark.sources import ofn_reader


@pytest.fixture(scope="module")
def tables(spark):
    return generator.to_spark(spark, generator.generate(n_terms=20, n_docs=1))


def _round_trip(spark, tables, tmp_path, **kw):
    out = str(tmp_path / "fixo_ofn")
    ofn_writer.write_ofn(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        "fixo", out, **kw,
    )
    return ofn_reader.read_ofn(spark, out)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_ofn_round_trip_terms(spark, tables, tmp_path):
    got = _round_trip(spark, tables, tmp_path)
    want = tables["terms"].where("prefix = 'fixo'")
    cols = ["prefix", "identifier", "name", "definition", "is_obsolete"]
    assert _rows(got["terms"], *cols) == _rows(want, *cols)


def test_ofn_round_trip_edges_and_annotations(spark, tables, tmp_path):
    got = _round_trip(spark, tables, tmp_path)
    assert _rows(
        got["parents"], "child_prefix", "child", "parent_prefix", "parent"
    ) == _rows(
        tables["parents"].where("child_prefix = 'fixo'"),
        "child_prefix", "child", "parent_prefix", "parent",
    )
    rel_cols = [
        "prefix", "identifier", "relation_prefix", "relation_id",
        "target_prefix", "target_id",
    ]
    assert _rows(got["relations"], *rel_cols) == _rows(
        tables["relations"].where("prefix = 'fixo'"), *rel_cols
    )
    assert _rows(got["alts"], "prefix", "identifier", "alt_id") == _rows(
        tables["alts"].where("prefix = 'fixo'"),
        "prefix", "identifier", "alt_id",
    )
    syn_cols = ["prefix", "identifier", "text", "predicate"]
    assert _rows(got["synonyms"], *syn_cols) == _rows(
        tables["synonyms"].where(
            "prefix = 'fixo' and predicate != 'rdfs:label'"
        ),
        *syn_cols,
    )
    xr_cols = ["prefix", "identifier", "predicate", "target_prefix", "target_id"]
    assert _rows(got["xrefs"], *xr_cols) == _rows(
        tables["xrefs"].where(
            "prefix = 'fixo' and predicate in "
            "('oboInOwl:hasDbXref', 'owl:equivalentClass')"
        ),
        *xr_cols,
    )


def test_ofn_reader_escaping_and_colon_targets(spark):
    doc = "\n".join([
        "Prefix(owl:=<http://www.w3.org/2002/07/owl#>)",
        "Ontology(<http://purl.obolibrary.org/obo/fixo.owl>",
        "Declaration(Class(obo:FIXO_1))",
        'AnnotationAssertion(rdfs:label obo:FIXO_1 "na\\"me\\\\x")',
        'AnnotationAssertion(oboInOwl:hasDbXref obo:FIXO_1 "smiles:C1:CC1")',
        'AnnotationAssertion(owl:deprecated obo:FIXO_1 "true"^^xsd:boolean)',
        "Declaration(ObjectProperty(obo:BFO_0000050))",
        'AnnotationAssertion(rdfs:label obo:BFO_0000050 "part of")',
        ")",
    ])
    lines = spark.createDataFrame([(s,) for s in doc.split("\n")], "value string")
    got = ofn_reader.parse_ofn_lines(lines)
    t = got["terms"].collect()
    assert len(t) == 1
    assert t[0]["name"] == 'na"me\\x'
    assert t[0]["is_obsolete"] is True
    xr = got["xrefs"].collect()[0]
    # target ids keep their own colons: split at the FIRST one only
    assert (xr["target_prefix"], xr["target_id"]) == ("smiles", "C1:CC1")
    td = got["typedefs"].collect()[0]
    assert (td["prefix"], td["identifier"], td["name"]) == (
        "bfo", "0000050", "part of",
    )


def test_ofn_literal_escaping_round_trip_stress(spark):
    """200 adversarial names (quotes, backslashes, unicode, parens,
    OFN-syntax lookalikes) survive ofn_document -> parse_ofn_lines
    exactly. Deterministic generation — no RNG."""
    import itertools

    atoms = ['"', "\\", '\\"', "\\\\", "a", "ü", "漢", "(", ")", " ",
             "obo:FAKE_1", "AnnotationAssertion(", "^^xsd:boolean"]
    names = []
    for i, combo in enumerate(itertools.product(atoms, repeat=2)):
        names.append("x" + "".join(combo) + f"y{i}")
        if len(names) >= 200:
            break
    terms = spark.createDataFrame(
        [("fixo", f"{i:07d}", nm, None, False) for i, nm in enumerate(names)],
        "prefix string, identifier string, name string, definition string, "
        "is_obsolete boolean",
    )
    empty = lambda ddl: spark.createDataFrame([], ddl)  # noqa: E731
    doc = ofn_writer.ofn_document(
        terms,
        empty("prefix string, identifier string, text string, predicate string"),
        empty("prefix string, identifier string, predicate string, "
              "target_prefix string, target_id string"),
        empty("prefix string, identifier string, relation_prefix string, "
              "relation_id string, target_prefix string, target_id string"),
        empty("child_prefix string, child string, parent_prefix string, "
              "parent string"),
        empty("prefix string, identifier string, alt_id string"),
        "fixo",
    )
    lines = spark.createDataFrame(
        [(s,) for s in doc.split("\n")], "value string"
    )
    got = ofn_reader.parse_ofn_lines(lines)
    back = {r["identifier"]: r["name"] for r in got["terms"].collect()}
    want = {f"{i:07d}": nm for i, nm in enumerate(names)}
    assert back == want


def test_ofn_persist_lines_caches_and_releases(spark, tmp_path):
    """persist_lines=True returns an 'unpersist' callback owning the
    shared line cache (mesh_source contract) — all eight tables read the
    cache, and the callback releases it."""
    p = tmp_path / "g.ofn"
    p.write_text(
        "Declaration(Class(obo:FIXO_1))\n"
        'AnnotationAssertion(rdfs:label obo:FIXO_1 "x")\n'
    )
    got = ofn_reader.read_ofn(spark, str(p), persist_lines=True)
    release = got.pop("unpersist")
    assert callable(release)
    assert sorted(got) == [
        "alts", "disjoints", "parents", "relations", "synonyms",
        "terms", "typedefs", "xrefs",
    ]
    rows = got["terms"].collect()
    assert [(r["identifier"], r["name"]) for r in rows] == [("1", "x")]
    # the cache is registered while held and released by the callback
    # (relative count: the module-scoped session may hold other caches)
    sc = spark.sparkContext
    held = len(sc._jsc.getPersistentRDDs())
    assert held > 0
    release(blocking=True)
    assert len(sc._jsc.getPersistentRDDs()) < held


def test_ofn_duplicate_assertions_do_not_fan_out(spark):
    """A legal external OFN may assert two labels/definitions for one
    class — the term-assembly joins must aggregate (lexicographic min),
    not fan out into duplicate term rows (r06 review)."""
    doc = [
        "Declaration(Class(obo:FIXO_1))",
        "Declaration(Class(obo:FIXO_1))",
        'AnnotationAssertion(rdfs:label obo:FIXO_1 "beta")',
        'AnnotationAssertion(rdfs:label obo:FIXO_1 "alpha")',
        'AnnotationAssertion(obo:IAO_0000115 obo:FIXO_1 "d2")',
        'AnnotationAssertion(obo:IAO_0000115 obo:FIXO_1 "d1")',
        'AnnotationAssertion(owl:deprecated obo:FIXO_1 "true"^^xsd:boolean)',
        'AnnotationAssertion(owl:deprecated obo:FIXO_1 "true"^^xsd:boolean)',
    ]
    lines = spark.createDataFrame([(s,) for s in doc], "value string")
    t = ofn_reader.parse_ofn_lines(lines)["terms"].collect()
    assert len(t) == 1
    assert (t[0]["name"], t[0]["definition"], t[0]["is_obsolete"]) == (
        "alpha", "d1", True,
    )
