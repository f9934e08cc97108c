"""Distributed N-Triples reader + SKOS table mapping."""

from __future__ import annotations

from pyobo_spark.sources.ntriples import SKOS, read_ntriples, skos_to_tables

NT = """# a comment line
<http://ex.org/fixk/0000001> <http://www.w3.org/2004/02/skos/core#prefLabel> "alpha thing" .
<http://ex.org/fixk/0000001> <http://www.w3.org/2004/02/skos/core#altLabel> "the alpha"@en .
<http://ex.org/fixk/0000002> <http://www.w3.org/2004/02/skos/core#prefLabel> "beta \\"quoted\\"" .
<http://ex.org/fixk/0000002> <http://www.w3.org/2004/02/skos/core#broader> <http://ex.org/fixk/0000001> .
<http://ex.org/fixk/0000002> <http://ex.org/count> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .

this line is garbage
"""


def test_read_ntriples(spark, tmp_path):
    p = tmp_path / "t.nt"
    p.write_text(NT)
    df = read_ntriples(spark, str(p))
    rows = df.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["parse_status"], []).append(r)
    assert len(by_status["ok"]) == 5
    assert len(by_status["malformed"]) == 1
    lit = [r for r in by_status["ok"] if r["predicate"] == "http://ex.org/count"][0]
    assert lit["is_literal"] and lit["object"] == "42"
    assert lit["datatype"] == "http://www.w3.org/2001/XMLSchema#integer"
    lang = [r for r in by_status["ok"] if r["language"] is not None][0]
    assert lang["language"] == "en"


def test_skos_to_tables(spark, tmp_path):
    p = tmp_path / "t.nt"
    p.write_text(NT)
    tables = skos_to_tables(
        read_ntriples(spark, str(p)), uri_prefix="http://ex.org/fixk/",
        prefix="fixk",
    )
    names = {(r["identifier"], r["name"]) for r in tables["names"].collect()}
    assert ("0000001", "alpha thing") in names
    assert len(names) == 2
    syn = tables["synonyms"].collect()
    assert syn[0]["text"] == "the alpha"
    assert [(r["child"], r["parent"]) for r in tables["parents"].collect()] == [
        ("0000002", "0000001")
    ]
    assert SKOS.endswith("#")
