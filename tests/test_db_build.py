"""Multi-prefix database build: failure isolation, counters, sample,
sorted deterministic output."""

from __future__ import annotations

import json

import pytest

from pyobo_spark.pipeline.db_build import build_artifact


def _names(spark, prefix, n):
    return spark.createDataFrame(
        [(prefix, f"{i:07d}", f"name {i}") for i in range(1, n + 1)],
        "prefix string, identifier string, name string",
    )


def test_failure_isolation_and_counters(spark, tmp_path):
    def boom():
        raise RuntimeError("download failed")

    report = build_artifact(
        spark,
        {
            "aaa": lambda: _names(spark, "aaa", 5),
            "bbb": lambda: _names(spark, "bbb", 3),
            "bad": boom,
        },
        str(tmp_path),
        "names",
    )
    assert report["n_rows"] == 8
    assert report["counters"] == {"aaa": 5, "bbb": 3}
    assert "bad" in report["failures"]
    assert "RuntimeError" in report["failures"]["bad"]
    assert len(report["sample"]) == 8  # min(10, n)

    meta = json.loads((tmp_path / "names" / "_METADATA.json").read_text())
    assert meta["n_prefixes_ok"] == 2

    out = spark.read.parquet(str(tmp_path / "names" / "data"))
    assert out.count() == 8


def test_strict_mode_reraises(spark, tmp_path):
    def boom():
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        build_artifact(
            spark,
            {"aaa": lambda: _names(spark, "aaa", 2), "bad": boom},
            str(tmp_path),
            "names2",
            strict=True,
        )


def test_all_failed_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        build_artifact(
            spark,
            {"bad": lambda: (_ for _ in ()).throw(RuntimeError("x"))},
            str(tmp_path),
            "names3",
        )


def test_get_ontology_format_priority(spark, tmp_path):
    """Format-priority dispatch (getters.py:92-216): OBO beats OBO Graph
    JSON beats SKOS; absent formats fall through; nothing available
    raises NoBuildError."""
    import json

    import pytest

    from pyobo_spark.pipeline.db_build import NoBuildError, get_ontology

    obo_text = """format-version: 1.4
ontology: tsto

[Term]
id: TSTO:1
name: from obo
"""
    og_path = tmp_path / "g.json"
    og_path.write_text(json.dumps({
        "graphs": [{
            "id": "g1",
            "nodes": [{
                "id": "http://purl.obolibrary.org/obo/TSTO_1",
                "lbl": "from obograph",
            }],
            "edges": [],
        }]
    }))
    nt_path = tmp_path / "g.nt"
    nt_path.write_text(
        "<http://purl.obolibrary.org/obo/TSTO_1> "
        "<http://www.w3.org/2004/02/skos/core#prefLabel> \"from skos\" .\n"
        "<http://purl.obolibrary.org/obo/TSTO_1> "
        "<http://www.w3.org/2004/02/skos/core#inScheme> "
        "<http://example.org/scheme> .\n"
    )

    ofn_path = tmp_path / "g.ofn"
    ofn_path.write_text(
        "Prefix(owl:=<http://www.w3.org/2002/07/owl#>)\n"
        "Ontology(<http://purl.obolibrary.org/obo/tsto.owl>\n"
        "Declaration(Class(obo:TSTO_1))\n"
        'AnnotationAssertion(rdfs:label obo:TSTO_1 "from ofn")\n'
        ")\n"
    )

    # all four present → obo wins
    tables = get_ontology(spark, "tsto", {
        "obo": obo_text, "ofn": str(ofn_path),
        "obograph": str(og_path), "skos": str(nt_path),
    })
    assert [r["name"] for r in tables["terms"].collect()] == ["from obo"]
    # obo absent → ofn wins (the reference's OWL slot: obo > owl > json)
    tables = get_ontology(spark, "tsto", {
        "ofn": str(ofn_path), "obograph": str(og_path), "skos": str(nt_path),
    })
    assert [r["name"] for r in tables["terms"].collect()] == ["from ofn"]
    # ofn absent → obograph wins
    tables = get_ontology(spark, "tsto", {
        "obograph": str(og_path), "skos": str(nt_path),
    })
    assert [r["name"] for r in tables["names"].collect()] == ["from obograph"]
    # only skos
    tables = get_ontology(spark, "tsto", {"skos": str(nt_path)})
    assert [r["name"] for r in tables["names"].collect()] == ["from skos"]
    with pytest.raises(NoBuildError):
        get_ontology(spark, "tsto", {})
