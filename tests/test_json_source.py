"""Declarative JSONL nomenclature source — second plugin-family exemplar
(reference: per-source converters in src/pyobo/sources/, JSON-payload
family). Covers nested synonym arrays and absent optional fields."""

from __future__ import annotations

from pyobo_spark.sources.json_source import JsonSpec, read_nomenclature_jsonl


def test_jsonl_source(spark, tmp_path):
    p = tmp_path / "nomen.jsonl"
    p.write_text(
        '{"acc": "1", "label": "alpha", "syns": ["a one", "first"], '
        '"up": null, "ref": "mesh:D1", "note": "n1"}\n'
        '{"acc": "2", "label": "beta", "syns": [], "up": "1", '
        '"ref": null, "note": null}\n'
        '{"acc": "3", "label": "gamma"}\n'
    )
    spec = JsonSpec(
        prefix="jsx", identifier="acc", name="label", synonyms="syns",
        parent="up", xref="ref", extras={"rdfs:comment": "note"},
    )
    tables = read_nomenclature_jsonl(spark, str(p), spec)

    names = {(r["identifier"], r["name"]) for r in tables["terms"].collect()}
    assert names == {("1", "alpha"), ("2", "beta"), ("3", "gamma")}

    syns = {(r["identifier"], r["text"]) for r in tables["synonyms"].collect()}
    assert syns == {("1", "a one"), ("1", "first")}

    parents = {
        (r["child_prefix"], r["child"], r["parent_prefix"], r["parent"])
        for r in tables["parents"].collect()
    }
    assert parents == {("jsx", "2", "jsx", "1")}

    xr = tables["xrefs"].collect()
    assert len(xr) == 1 and (xr[0]["target_prefix"], xr[0]["target_id"]) == (
        "mesh", "D1",
    )
    props = tables["properties"].collect()
    assert len(props) == 1 and props[0]["value"] == "n1"


def test_jsonl_source_missing_optional_fields(spark, tmp_path):
    """A JSONL dump without the optional fields still produces terms —
    spark.read.json drops absent fields from the inferred schema, so the
    spec must tolerate missing columns rather than raise."""
    p = tmp_path / "minimal.jsonl"
    p.write_text('{"acc": "9", "label": "iota"}\n')
    spec = JsonSpec(
        prefix="jsx", identifier="acc", name="label", synonyms="syns",
        parent="up", xref="ref", extras={"rdfs:comment": "note"},
    )
    tables = read_nomenclature_jsonl(spark, str(p), spec)
    assert set(tables) == {"terms"}
    assert tables["terms"].count() == 1


def test_jsonl_feeds_catalog(spark, tmp_path):
    """JSONL tables plug into the same catalog/grounding machinery."""
    from pyobo_spark.api import OntologyCatalog

    p = tmp_path / "n.jsonl"
    p.write_text(
        '{"acc": "1", "label": "alpha thing", "syns": ["the alpha"], "up": null}\n'
        '{"acc": "2", "label": "beta thing", "syns": [], "up": "1"}\n'
    )
    spec = JsonSpec(prefix="jsx", identifier="acc", name="label",
                    synonyms="syns", parent="up")
    cat = OntologyCatalog(read_nomenclature_jsonl(spark, str(p), spec))
    assert cat.get_id_name_mapping("jsx") == {
        "1": "alpha thing", "2": "beta thing",
    }
    assert cat.get_ancestors("jsx", "2") == {"jsx:1"}
    assert cat.ground("jsx", "THE ALPHA") == "jsx:1"
