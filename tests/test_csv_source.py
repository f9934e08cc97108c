"""Generic CSV nomenclature source (the 54-plugin exemplar)."""

from __future__ import annotations

from pyobo_spark.api import OntologyCatalog
from pyobo_spark.sources.csv_source import ColumnSpec, read_nomenclature_csv

CSV = """gene_id,symbol,full_name,aliases,ensembl,parent_id,withdrawn
1,TP53,tumor protein p53,p53|LFS1,ensembl:ENSG0000141510,,false
2,BRCA1,BRCA1 DNA repair associated,RNF53,ensembl:ENSG0000012048,1,false
3,OLD1,withdrawn gene,,,1,true
"""


def test_csv_nomenclature(spark, tmp_path):
    p = tmp_path / "genes.csv"
    p.write_text(CSV)
    spec = ColumnSpec(
        prefix="fixg", identifier="gene_id", name="symbol",
        definition="full_name", synonyms="aliases", xref="ensembl",
        parent="parent_id", obsolete="withdrawn",
        extras={"pyobo:full_name": "full_name"},
    )
    tables = read_nomenclature_csv(spark, str(p), spec)
    terms = {r["identifier"]: r for r in tables["terms"].collect()}
    assert terms["1"]["name"] == "TP53"
    assert terms["3"]["is_obsolete"] is True

    syn = {(r["identifier"], r["text"]) for r in tables["synonyms"].collect()}
    assert ("1", "p53") in syn and ("1", "LFS1") in syn and ("2", "RNF53") in syn

    xr = {(r["identifier"], r["target_prefix"], r["target_id"])
          for r in tables["xrefs"].collect()}
    assert ("1", "ensembl", "ENSG0000141510") in xr

    parents = {(r["child"], r["parent"]) for r in tables["parents"].collect()}
    assert parents == {("2", "1"), ("3", "1")}

    props = tables["properties"].collect()
    assert any(r["value"] == "tumor protein p53" for r in props)

    # straight into the PyOBO-compatible API
    cat = OntologyCatalog(
        dict(tables, alts=spark.createDataFrame(
            [], "prefix string, identifier string, alt_id string"),
            relations=spark.createDataFrame(
            [], "prefix string, identifier string, relation_prefix string,"
                "relation_id string, target_prefix string, target_id string"))
    )
    assert cat.get_id_name_mapping("fixg")["2"] == "BRCA1"
    assert cat.get_obsolete("fixg") == {"3"}
    assert cat.ground("fixg", "p53") == "fixg:1"
