"""HGNC-envelope JSON source exemplar — golden test on a fixture
excerpt shaped exactly like the real hgnc_complete_set.json payload
(reference sources/hgnc/hgnc.py:270-420)."""

from __future__ import annotations

import json

import pytest

from pyobo_spark.sources.hgnc_source import EnvelopeSpec, read_hgnc_json

FIXTURE = {
    "responseHeader": {"status": 0, "QTime": 13},
    "response": {
        "numFound": 4,
        "docs": [
            {
                "hgnc_id": "HGNC:5",
                "symbol": "A1BG",
                "name": "alpha-1-B glycoprotein",
                "status": "Approved",
                "entrez_id": "1",
                "ensembl_gene_id": "ENSG00000121410",
                "refseq_accession": ["NM_130786."],
                "ccds_id": ["CCDS12976"],
                "omim_id": ["138670"],
                "alias_symbol": ["A1B", "ABG"],
            },
            {
                "hgnc_id": "HGNC:7",
                "symbol": "A2M",
                "name": "alpha-2-macroglobulin",
                "status": "Approved",
                "entrez_id": "2",
                "merops": "XM02-001",
                "prev_symbol": ["FWP007"],
                "ccds_id": ["CCDS44827", "CCDS86765"],
            },
            {
                "hgnc_id": "HGNC:8",
                "symbol": "A2MP1",
                "name": "alpha-2-macroglobulin pseudogene 1",
                "status": "Entry Withdrawn",
            },
            {
                "hgnc_id": "HGNC:13666",
                "symbol": "SELENOP",
                "name": "selenoprotein P",
                "status": "Approved",
            },
        ],
    },
}


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("hgnc") / "hgnc_complete_set.json"
    path.write_text(json.dumps(FIXTURE))
    return read_hgnc_json(spark, str(path))


def test_terms_banana_status_and_name_swap(tables):
    terms = {r["identifier"]: r for r in tables["terms"].collect()}
    # banana stripped: "HGNC:5" → "5" (hgnc.py:293-296)
    assert set(terms) == {"5", "7", "8", "13666"}
    # symbol-as-name / name-as-definition (hgnc.py:307-310)
    assert terms["5"]["name"] == "A1BG"
    assert terms["5"]["definition"] == "alpha-1-B glycoprotein"
    # status routing (hgnc.py:298-305)
    assert not terms["5"]["is_obsolete"]
    assert terms["8"]["is_obsolete"]
    assert all(r["species_id"] == "9606" for r in terms.values())
    assert all(r["prefix"] == "hgnc" for r in terms.values())


def test_xref_routing_and_fixups(tables):
    xr = [
        (r["identifier"], r["predicate"], r["target_prefix"], r["target_id"])
        for r in tables["xrefs"].collect()
    ]
    # single-valued keys → exact match (hgnc.py:404-410)
    assert ("5", "skos:exactMatch", "ncbigene", "1") in xr
    assert ("5", "skos:exactMatch", "ensembl", "ENSG00000121410") in xr
    # 1-element array is still single-valued
    assert ("5", "skos:exactMatch", "ccds", "CCDS12976") in xr
    # multi-valued array → plain xrefs (hgnc.py:411-415)
    assert ("7", "oboInOwl:hasDbXref", "ccds", "CCDS44827") in xr
    assert ("7", "oboInOwl:hasDbXref", "ccds", "CCDS86765") in xr
    # merops '-' → '.' (hgnc.py:395-397)
    assert ("7", "skos:exactMatch", "merops.entry", "XM02.001") in xr
    # refseq trailing-dot strip (hgnc.py:399-401)
    assert ("5", "skos:exactMatch", "refseq", "NM_130786") in xr
    # absent keys contribute nothing
    assert not [t for t in xr if t[0] == "13666"]


def test_synonym_types(tables):
    """Both alias and previous symbols are EXACT-specificity in the
    reference (append_synonym defaults, hgnc.py:427-436) and differ by
    synonym TYPE (struct.py:252-260) — predicate must not be downgraded
    or grounding scores change (exact 0.9 vs related 0.5)."""
    syn = {
        (r["identifier"], r["text"]): (r["predicate"], r["type"])
        for r in tables["synonyms"].collect()
    }
    assert syn[("5", "A1B")] == ("oboInOwl:hasExactSynonym", "OMO:0003016")
    assert syn[("5", "ABG")] == ("oboInOwl:hasExactSynonym", "OMO:0003016")
    assert syn[("7", "FWP007")] == ("oboInOwl:hasExactSynonym", "OMO:0003015")
    assert len(syn) == 3


def test_catalog_integration(spark, tmp_path):
    """The envelope source's tables drive the standard API surface."""
    from pyobo_spark.api import OntologyCatalog

    path = tmp_path / "hgnc.json"
    path.write_text(json.dumps(FIXTURE))
    tables = read_hgnc_json(spark, str(path), EnvelopeSpec())
    cat = OntologyCatalog(tables)
    assert cat.get_name("hgnc", "5") == "A1BG"
    assert "8" in cat.get_obsolete("hgnc")
    assert "A1B" in cat.get_synonyms("hgnc", "5")
    # from_species relations make the species API work (hgnc.py:281)
    assert cat.get_species("hgnc", "5") == "9606"
    # absent alts table degrades to empty mappings, not AttributeError
    assert cat.get_alts_to_id("hgnc") == {}
    assert cat.get_id_to_alts("hgnc") == {}
    # refseq fixup strips leading dots too (reference str.strip('.'))
    from pyobo_spark.sources.hgnc_source import _fixup
    from pyspark.sql import functions as F

    row = (
        tables["terms"].sparkSession.range(1)
        .select(_fixup("refseq", F.lit(".NM_021728.")).alias("v"))
        .collect()[0]
    )
    assert row["v"] == "NM_021728"
    # every table attr is schema-typed (uniform empty defaults) — the
    # full lookup surface works on a subset-emitting source
    assert cat.get_properties_df("hgnc").count() == 0
    assert cat.get_id_to_alts("hgnc") == {}
    assert cat.get_replaced_by("hgnc", "5") is None
    assert cat.get_subsets_df("hgnc").count() == 0
