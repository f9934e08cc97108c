"""Round-trip: fixture tables → OBO text (write_obo semantics) →
parse_obo_text → same tables. Mirrors the reference's serialization
round-trip family (tests/test_struct/test_obo/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyobo_spark.fixtures import generator
from pyobo_spark.operators import obo_writer
from pyobo_spark.sources.obo_reader import parse_obo_text


@pytest.fixture(scope="module")
def tables(spark):
    return generator.to_spark(spark, generator.generate(n_terms=60, n_docs=1))


def test_roundtrip(spark, tables):
    stanzas = obo_writer.obo_stanzas(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        prefix="fixo",
    )
    doc = obo_writer.obo_document(stanzas, "fixo", "7")
    po = parse_obo_text(doc)
    assert po.prefix == "fixo"

    # terms: names match
    orig_names = {
        (r["identifier"], r["name"])
        for r in tables["terms"].where("prefix = 'fixo'").collect()
    }
    parsed_names = {(t["identifier"], t["name"]) for t in po.terms}
    assert parsed_names == orig_names

    # obsoletes preserved
    orig_obs = {
        r["identifier"]
        for r in tables["terms"].where("prefix = 'fixo' and is_obsolete").collect()
    }
    assert {t["identifier"] for t in po.terms if t["is_obsolete"]} == orig_obs

    # definitions: parsed defs equal the CLEANED originals (the reader
    # applies the reference's whitespace collapse, struct.py:1635-1638)
    from pyobo_spark.operators.exports import definitions

    orig_defs = {
        (r["identifier"], r["definition"])
        for r in definitions(tables["terms"].where("prefix = 'fixo'")).collect()
    }
    parsed_defs = {
        (t["identifier"], t["definition"]) for t in po.terms if t["definition"]
    }
    assert parsed_defs == orig_defs

    # synonyms: text + predicate survive
    orig_syn = {
        (r["identifier"], r["text"], r["predicate"])
        for r in tables["synonyms"].collect()
    }
    parsed_syn = {
        (s["identifier"], s["text"], s["predicate"]) for s in po.synonyms
    }
    assert parsed_syn == orig_syn

    # xrefs (hasDbXref rows), is_a edges, alt ids
    orig_xr = {
        (r["identifier"], r["target_prefix"], r["target_id"])
        for r in tables["xrefs"]
        .where("prefix = 'fixo' and predicate = 'oboInOwl:hasDbXref'")
        .collect()
    }
    assert {
        (x["identifier"], x["target_prefix"], x["target_id"]) for x in po.xrefs
    } == orig_xr
    assert {(p["child"], p["parent"]) for p in po.parents} == {
        (r["child"], r["parent"]) for r in tables["parents"].collect()
    }
    assert {(a["identifier"], a["alt_id"]) for a in po.alts} == {
        (r["identifier"], r["alt_id"]) for r in tables["alts"].collect()
    }

    # relations survive with predicates
    orig_rel = {
        (r["identifier"], r["relation_prefix"], r["relation_id"], r["target_id"])
        for r in tables["relations"].where("prefix = 'fixo'").collect()
    }
    parsed_rel = {
        (r["identifier"], r["relation_prefix"], r["relation_id"], r["target_id"])
        for r in po.relations
    }
    assert parsed_rel == orig_rel


def test_deterministic_output(spark, tables):
    """Same input → byte-identical OBO document (the reference's sorted
    deterministic-output contract, utils/io.py:134)."""
    mk = lambda: obo_writer.obo_document(  # noqa: E731
        obo_writer.obo_stanzas(
            tables["terms"], tables["synonyms"], tables["xrefs"],
            tables["relations"], tables["parents"], tables["alts"],
            prefix="fixo",
        ),
        "fixo",
    )
    assert mk() == mk()


def test_roundtrip_extended_tags(spark):
    """New stanza families round-trip: subset / intersection_of /
    replaced_by / consider through obo_stanzas, and the wide [Typedef]
    fields through obo_typedef_stanzas."""
    src = """format-version: 1.4
ontology: tsto
data-version: 9

[Term]
id: TSTO:0000001
name: composite thing
subset: core_slim
intersection_of: TSTO:0000002
intersection_of: BFO:0000050 TSTO:0000003

[Term]
id: TSTO:0000002
name: genus thing

[Term]
id: TSTO:0000003
name: host thing

[Term]
id: TSTO:0000004
name: dead thing
is_obsolete: true
replaced_by: TSTO:0000001
consider: TSTO:0000002

[Typedef]
id: BFO:0000050
name: part of
domain: BFO:0000004
range: BFO:0000004
holds_over_chain: BFO:0000050 BFO:0000050
is_transitive: true
inverse_of: BFO:0000051
"""
    from pyobo_spark.sources.obo_reader import parse_obo_files

    tables = parse_obo_files(spark, [("tsto", src)])
    stanzas = obo_writer.obo_stanzas(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        prefix="tsto",
        subsets=tables["subsets"],
        intersections=tables["intersections"],
        replaced_by=tables["replaced_by"],
        considers=tables["considers"],
    )
    doc = obo_writer.obo_document(stanzas, "tsto", "9")
    po = parse_obo_text(doc)
    assert po.subsets == [
        {"prefix": "tsto", "identifier": "0000001", "subset": "core_slim"}
    ]
    assert {
        (i["relation_prefix"], i["relation_id"],
         i["target_prefix"], i["target_id"])
        for i in po.intersections
    } == {("", "", "tsto", "0000002"), ("BFO", "0000050", "tsto", "0000003")}
    assert po.replaced_by == [
        {"prefix": "tsto", "identifier": "0000004",
         "replacement_prefix": "tsto", "replacement_id": "0000001"}
    ]
    assert po.considers[0]["consider_id"] == "0000002"

    td_stanzas = obo_writer.obo_typedef_stanzas(tables["typedefs"], "tsto")
    td_text = "\n\n".join(
        r["stanza_text"] for r in td_stanzas.orderBy("identifier").collect()
    )
    po2 = parse_obo_text(
        "format-version: 1.4\nontology: tsto\n\n" + td_text
    )
    td = po2.typedefs[0]
    assert td["domain"] == "BFO:0000004"
    assert td["range"] == "BFO:0000004"
    assert td["holds_over_chain"] == [["BFO:0000050", "BFO:0000050"]]
    assert td["is_transitive"] is True
    assert td["inverse_of"] == "BFO:0000051"


def test_typedef_serialization_scoped_to_owning_document(spark):
    """A multi-document catalog serializes only the requested document's
    typedefs (ownership tracked by the `ontology` column, since typedef
    CURIE prefixes are predicate namespaces like BFO shared across
    documents)."""
    from pyobo_spark.sources.obo_reader import parse_obo_files

    a = """format-version: 1.4
ontology: aona

[Typedef]
id: BFO:0000050
name: part of
"""
    b = """format-version: 1.4
ontology: bonb

[Typedef]
id: RO:0002212
name: negatively regulates
"""
    tables = parse_obo_files(spark, [("aona", a), ("bonb", b)])
    td = obo_writer.obo_typedef_stanzas(tables["typedefs"], "aona").collect()
    assert len(td) == 1 and "part of" in td[0]["stanza_text"]
    assert "negatively regulates" not in td[0]["stanza_text"]


def test_preferred_prefix_casing(spark, tables):
    """Emitted CURIEs use registry preferred casing, not blanket upper:
    ncbitaxon -> NCBITaxon; unregistered prefixes pass through unchanged
    (ADVICE r02: F.upper mangled mixed-case prefixes)."""
    xrefs = spark.createDataFrame(
        [("fixo", "0000001", "oboInOwl:hasDbXref", "ncbitaxon", "9606"),
         ("fixo", "0000001", "oboInOwl:hasDbXref", "myweird", "1")],
        "prefix string, identifier string, predicate string, "
        "target_prefix string, target_id string",
    )
    empty = tables["synonyms"].limit(0)
    stanzas = obo_writer.obo_stanzas(
        tables["terms"].where("identifier = '0000001'"), empty, xrefs,
        tables["relations"].limit(0),
        tables["parents"].limit(0), tables["alts"].limit(0),
        prefix="fixo",
    )
    text = stanzas.collect()[0]["stanza_text"]
    assert "xref: NCBITaxon:9606" in text
    assert "NCBITAXON" not in text
    assert "xref: myweird:1" in text


def test_write_obo_document_distributed(spark, tables, tmp_path):
    """Distributed write.text sink is byte-identical to the driver-side
    obo_document (VERDICT r02: remove the collect() from the OBO export
    path)."""
    import glob

    stanzas = obo_writer.obo_stanzas(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        prefix="fixo",
    )
    want = obo_writer.obo_document(stanzas, "fixo", "7")
    out = str(tmp_path / "fixo_obo")
    obo_writer.write_obo_document(stanzas, out, "fixo", "7")
    parts = sorted(glob.glob(out + "/part-*"))
    got = "".join(open(p).read() for p in parts)
    assert got == want


def test_empty_ontology_byte_parity(spark, tables, tmp_path):
    """Zero-stanza document: driver and distributed paths agree
    byte-for-byte (header only; r03 review)."""
    import glob

    empty = obo_writer.obo_stanzas(
        tables["terms"].where("prefix = 'nosuch'"),
        tables["synonyms"].limit(0), tables["xrefs"].limit(0),
        tables["relations"].limit(0), tables["parents"].limit(0),
        tables["alts"].limit(0), prefix="nosuch",
    )
    want = obo_writer.obo_document(empty, "nosuch", "1")
    out = str(tmp_path / "empty_obo")
    obo_writer.write_obo_document(empty, out, "nosuch", "1")
    parts = sorted(glob.glob(out + "/part-*"))
    got = "".join(open(p).read() for p in parts)
    assert got == want


def test_disjoint_from_roundtrip(spark):
    """disjoint_from lines survive parse → serialize → parse."""
    src = (
        "format-version: 1.4\nontology: tsto\n\n"
        "[Term]\nid: TSTO:0000001\nname: a\n"
        "disjoint_from: TSTO:0000002\n\n"
        "[Term]\nid: TSTO:0000002\nname: b\n"
    )
    from pyobo_spark.sources.obo_reader import parse_obo_files

    tables = parse_obo_files(spark, [("tsto", src)])
    stanzas = obo_writer.obo_stanzas(
        tables["terms"], tables["synonyms"], tables["xrefs"],
        tables["relations"], tables["parents"], tables["alts"],
        prefix="tsto", disjoints=tables["disjoints"],
    )
    doc = obo_writer.obo_document(stanzas, "tsto", "1")
    assert "disjoint_from: tsto:0000002" in doc
    po = parse_obo_text(doc)
    assert [(d["identifier"], d["target_id"]) for d in po.disjoints] == [
        ("0000001", "0000002")
    ]
