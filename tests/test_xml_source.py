"""Declarative XML converter exemplar (MeSH-like record XML)."""

from __future__ import annotations

from pyobo_spark.sources.xml_source import XmlSpec, read_nomenclature_xml

MESH_LIKE = """<?xml version="1.0"?>
<DescriptorRecordSet>
<DescriptorRecord>
 <DescriptorUI>D000001</DescriptorUI>
 <DescriptorName><String>Calcimycin</String></DescriptorName>
 <ScopeNote> An ionophorous antibiotic. </ScopeNote>
 <ConceptList>
  <Concept><TermList>
   <Term><String>A-23187</String></Term>
   <Term><String>A23187</String></Term>
  </TermList></Concept>
 </ConceptList>
 <TreeParent>D000000</TreeParent>
</DescriptorRecord>
<DescriptorRecord>
 <DescriptorUI>D000002</DescriptorUI>
 <DescriptorName><String>Temefos</String></DescriptorName>
</DescriptorRecord>
</DescriptorRecordSet>
"""

SPEC = XmlSpec(
    prefix="mesh",
    record_tag="DescriptorRecord",
    identifier="DescriptorUI",
    name="DescriptorName/String",
    definition="ScopeNote",
    synonyms=".//TermList/Term/String",
    parent="TreeParent",
    extras={"mesh:treeParent": "TreeParent"},
)


def test_xml_source_tables(spark, tmp_path):
    p = tmp_path / "mesh.xml"
    p.write_text(MESH_LIKE)
    tables = read_nomenclature_xml(spark, str(p), SPEC)
    terms = {r["identifier"]: r for r in tables["terms"].collect()}
    assert set(terms) == {"D000001", "D000002"}
    assert terms["D000001"]["name"] == "Calcimycin"
    assert terms["D000001"]["definition"] == "An ionophorous antibiotic."
    assert terms["D000002"]["definition"] is None
    syn = {
        (r["identifier"], r["text"]) for r in tables["synonyms"].collect()
    }
    assert syn == {("D000001", "A-23187"), ("D000001", "A23187")}
    par = tables["parents"].collect()
    assert [(r["child"], r["parent"]) for r in par] == [
        ("D000001", "D000000")
    ]
    props = {
        (r["source_curie"], r["predicate_curie"], r["value"])
        for r in tables["properties"].collect()
    }
    assert ("mesh:D000001", "mesh:treeParent", "D000000") in props


def test_xml_source_distributes_records(spark, tmp_path):
    """The record split happens at the DATA SOURCE (lineSep), so the
    pre-parse plan is a plain distributed text scan with no shuffle."""
    p = tmp_path / "mesh.xml"
    p.write_text(MESH_LIKE)
    tables = read_nomenclature_xml(spark, str(p), SPEC)
    plan = tables["terms"]._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
