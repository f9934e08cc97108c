"""OBO Graph JSON reader: spark.read.json + explode → long tables."""

from __future__ import annotations

import json

from pyobo_spark.sources.obograph import obograph_to_tables, read_obograph

DOC = {
    "graphs": [
        {
            "id": "http://purl.obolibrary.org/obo/fixo.json",
            "nodes": [
                {"id": "http://purl.obolibrary.org/obo/FIXO_0000001",
                 "lbl": "alpha", "type": "CLASS"},
                {"id": "http://purl.obolibrary.org/obo/FIXO_0000002",
                 "lbl": "beta", "type": "CLASS",
                 "meta": {"deprecated": True}},
            ],
            "edges": [
                {"sub": "http://purl.obolibrary.org/obo/FIXO_0000002",
                 "pred": "is_a",
                 "obj": "http://purl.obolibrary.org/obo/FIXO_0000001"},
            ],
        }
    ]
}


def test_read_obograph(spark, tmp_path):
    path = tmp_path / "g.json"
    path.write_text(json.dumps(DOC))
    out = read_obograph(spark, str(path))
    nodes = {r["node_id"]: r for r in out["nodes"].collect()}
    assert len(nodes) == 2
    assert nodes["http://purl.obolibrary.org/obo/FIXO_0000002"]["deprecated"]
    edges = out["edges"].collect()
    assert len(edges) == 1 and edges[0]["predicate"] == "is_a"

    tables = obograph_to_tables(
        out["nodes"], out["edges"],
        uri_prefix="http://purl.obolibrary.org/obo/", prefix="fixo",
    )
    names = {(r["identifier"], r["name"]) for r in tables["names"].collect()}
    assert names == {("0000001", "alpha"), ("0000002", "beta")}
    assert [(r["child"], r["parent"]) for r in tables["parents"].collect()] == [
        ("0000002", "0000001")
    ]
