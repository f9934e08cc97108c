"""MeSH-style multi-file-join converter exemplar (sixth converter
idiom): two XML dumps, derived-key tree-number self-join for parents,
synthetic roots, registry-number xref classification. Mirrors the
reference's sources/mesh.py semantics on a hand-computed fixture."""

from __future__ import annotations

import pytest

from pyobo_spark.sources import mesh_source as M

DESC_XML = """<?xml version="1.0"?>
<DescriptorRecordSet LanguageCode="eng">
 <DescriptorRecord DescriptorClass="1">
  <DescriptorUI>D001829</DescriptorUI>
  <DescriptorName><String>Body Regions</String></DescriptorName>
  <TreeNumberList><TreeNumber>A01</TreeNumber></TreeNumberList>
  <ConceptList>
   <Concept PreferredConceptYN="Y">
    <ConceptName><String>Body Regions</String></ConceptName>
    <ScopeNote>Anatomical areas of the body.</ScopeNote>
    <RegistryNumber>0</RegistryNumber>
    <TermList>
     <Term><String>Body Regions</String></Term>
     <Term><String>Regions, Body</String></Term>
    </TermList>
   </Concept>
  </ConceptList>
 </DescriptorRecord>
 <DescriptorRecord DescriptorClass="1">
  <DescriptorUI>D005121</DescriptorUI>
  <DescriptorName><String>Extremities</String></DescriptorName>
  <TreeNumberList><TreeNumber>A01.378</TreeNumber></TreeNumberList>
  <ConceptList>
   <Concept PreferredConceptYN="Y">
    <ConceptName><String>Extremities</String></ConceptName>
    <TermList>
     <Term><String>Limbs</String></Term>
    </TermList>
   </Concept>
  </ConceptList>
 </DescriptorRecord>
 <DescriptorRecord DescriptorClass="1">
  <DescriptorUI>D000201</DescriptorUI>
  <DescriptorName><String>Acetyl Coenzyme A</String></DescriptorName>
  <TreeNumberList>
   <TreeNumber>D03.633.100</TreeNumber>
   <TreeNumber>A01.378.100</TreeNumber>
  </TreeNumberList>
  <ConceptList>
   <Concept PreferredConceptYN="Y">
    <ConceptName><String>Acetyl Coenzyme A</String></ConceptName>
    <RegistryNumber>72-89-9</RegistryNumber>
    <RelatedRegistryNumberList>
     <RegistryNumber>EC 2.3.1.-</RegistryNumber>
     <RegistryNumber>txid9606</RegistryNumber>
     <RegistryNumber>ABC1234XYZ</RegistryNumber>
     <RegistryNumber>weird format!</RegistryNumber>
    </RelatedRegistryNumberList>
    <TermList>
     <Term><String>Acetyl-CoA</String></Term>
    </TermList>
   </Concept>
  </ConceptList>
 </DescriptorRecord>
</DescriptorRecordSet>
"""

SUPP_XML = """<?xml version="1.0"?>
<SupplementalRecordSet LanguageCode="eng">
 <SupplementalRecord SCRClass="1">
  <SupplementalRecordUI>C000002</SupplementalRecordUI>
  <SupplementalRecordName><String>bevonium</String></SupplementalRecordName>
  <ConceptList>
   <Concept PreferredConceptYN="Y">
    <ConceptName><String>bevonium</String></ConceptName>
    <RegistryNumber>33371-53-8</RegistryNumber>
    <TermList>
     <Term><String>bevonium methylsulfate</String></Term>
    </TermList>
   </Concept>
  </ConceptList>
 </SupplementalRecord>
</SupplementalRecordSet>
"""


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh")
    (d / "desc.xml").write_text(DESC_XML)
    (d / "supp.xml").write_text(SUPP_XML)
    return M.read_mesh(spark, str(d / "desc.xml"), str(d / "supp.xml"))


def test_terms_union_both_files_plus_roots(tables):
    rows = {r["identifier"]: r for r in tables["terms"].collect()}
    # 3 descriptors + 1 supplemental + supplemental-record root + 16
    # tree-header roots
    assert len(rows) == 3 + 1 + 1 + 16
    assert rows["D001829"]["name"] == "Body Regions"
    assert rows["D001829"]["definition"] == "Anatomical areas of the body."
    assert rows["D005121"]["definition"] is None
    assert rows["C000002"]["name"] == "bevonium"
    assert rows["A"]["name"] == "Anatomy"
    assert rows[M.SUPPLEMENT_PARENT_ID]["name"] == "supplemental records"
    assert all(r["prefix"] == "mesh" for r in rows.values())


def test_tree_number_parent_self_join(tables):
    got = {
        (r["child"], r["parent"]) for r in tables["parents"].collect()
    }
    assert got == {
        # dotless tree number A01 → synthetic letter root (mesh.py:236-242)
        ("D001829", "A"),
        # A01.378 → owner of A01
        ("D005121", "D001829"),
        # A01.378.100 → owner of A01.378; D03.633.100's parent tree
        # number D03.633 has NO owner in this dump → skipped (the
        # reference's missing-tree-number log-and-skip)
        ("D000201", "D005121"),
        # supplemental records parent to the synthetic root
        ("C000002", M.SUPPLEMENT_PARENT_ID),
    }


def test_synonyms_exclude_record_name(tables):
    syn = {}
    for r in tables["synonyms"].collect():
        syn.setdefault(r["identifier"], set()).add(r["text"])
    assert syn["D001829"] == {"Regions, Body"}  # own name excluded
    assert syn["D005121"] == {"Limbs"}
    assert syn["D000201"] == {"Acetyl-CoA"}
    assert syn["C000002"] == {"bevonium methylsulfate"}


def test_registry_number_xref_classification(tables):
    got = {
        (r["identifier"], r["target_prefix"], r["target_id"])
        for r in tables["xrefs"].collect()
    }
    assert got == {
        ("D000201", "cas", "72-89-9"),       # CAS pattern
        ("D000201", "eccode", "2.3.1"),      # EC + standardize_ec strip
        ("D000201", "ncbitaxon", "9606"),    # txid prefix (canonical lowercase storage)
        ("D000201", "unii", "ABC1234XYZ"),   # 10-alnum
        ("C000002", "cas", "33371-53-8"),
        # RegistryNumber 0 and "weird format!" dropped
    }


def test_catalog_integration(spark, tables):
    """The multi-file source plugs straight into the catalog like every
    other converter (hierarchy traversal through the synthetic roots)."""
    from pyobo_spark.api import OntologyCatalog

    cat = OntologyCatalog(tables)
    assert cat.get_name("mesh", "D005121") == "Extremities"
    assert cat.get_ancestors("mesh", "D000201") == {
        "mesh:D005121", "mesh:D001829", "mesh:A",
    }
    syn = cat.get_synonyms("MESH", "D000201")
    assert syn == ["Acetyl-CoA"]


def test_unpersist_releases_parsed_caches(spark, tmp_path):
    """read_mesh pins the PARSED record DataFrames (desc/supp), not the
    derived tables it returns — so the release path must be the
    returned ``unpersist()`` callable (ADVICE r05: .unpersist() on the
    derived tables would be a no-op on the caches). Uses its own
    read_mesh call so the module-scoped ``tables`` fixture keeps its
    caches."""
    from pyobo_spark.sources import mesh_source as M

    (tmp_path / "desc.xml").write_text(DESC_XML)
    (tmp_path / "supp.xml").write_text(SUPP_XML)
    tables = M.read_mesh(
        spark, str(tmp_path / "desc.xml"), str(tmp_path / "supp.xml")
    )
    tables["terms"].count()  # materialize the caches
    sc = spark.sparkContext
    before = len([
        r for r in sc._jsc.sc().getRDDStorageInfo() if r.isCached()
    ])
    assert before >= 2  # desc + supp pinned
    tables["unpersist"](blocking=True)
    after = len([
        r for r in sc._jsc.sc().getRDDStorageInfo() if r.isCached()
    ])
    assert after <= before - 2, (before, after)
