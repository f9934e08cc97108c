"""ExPASy ENZYME flat-file source (reference sources/expasy.py) — the
line-code record-grammar converter idiom: ``//``-terminated records,
2-letter field codes, fixed-column tree file, multi-line field
concatenation, deleted/transferred obsolescence, member edges."""

from __future__ import annotations

import pytest

from pyobo_spark.sources import expasy_source as X

ENZYME_DAT = """\
CC   -----------------------------------------------------------------------
CC   Release of 2024-01-01
CC   -----------------------------------------------------------------------
//
ID   1.1.1.1
DE   Alcohol dehydrogenase.
AN   Aldehyde reductase.
AN   ADH.
CA   (1) a primary alcohol + NAD(+) = an aldehyde + NADH.
CA   (2) a secondary alcohol + NAD(+) = a ketone + NADH.
CF   Zn(2+) or Fe cation.
PR   PROSITE; PS00059;
DR   P07327, ADH1A_HUMAN;  P28469, ADH1A_MACMU;
DR   Q5RBP7, ADH1A_PONAB;
//
ID   1.1.1.2
DE   Alcohol dehydrogenase (NADP(+)). This enzyme spans
DE   two DE lines.
CA   A reaction.
//
ID   1.1.1.5
DE   Transferred entry: 1.1.1.198, 1.1.1.227 and 1.1.1.228.
//
ID   1.1.1.74
DE   Deleted entry.
//
"""

ENZCLASS = """\
Some header text
1. -. -.-  Oxidoreductases.
1. 1. -.-  Acting on the CH-OH group of donors.
1. 1. 1.-  With NAD(+) or NADP(+) as acceptor.
2. -. -.-  Transferases.

Trailing text
"""

EC2GO = """\
!version 1.2
EC:1.1.1.1 > GO:alcohol dehydrogenase (NAD+) activity ; GO:0004022
EC:9.9.9.9 > GO:bogus unmapped activity ; GO:0099999
"""


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("expasy")
    (d / "enzyme.dat").write_text(ENZYME_DAT)
    (d / "enzclass.txt").write_text(ENZCLASS)
    (d / "ec2go").write_text(EC2GO)
    t = X.read_expasy(
        spark,
        str(d / "enzyme.dat"),
        enzclass_path=str(d / "enzclass.txt"),
        ec2go_path=str(d / "ec2go"),
    )
    yield t
    t["unpersist"]()


def test_terms_tree_and_records(tables):
    rows = {r["identifier"]: r for r in tables["terms"].collect()}
    # 4 tree classes + 2 active + 2 obsolete records
    assert len(rows) == 8
    assert rows["1"]["name"] == "Oxidoreductases"
    assert rows["1.1.1"]["name"] == "With NAD(+) or NADP(+) as acceptor"
    assert rows["1.1.1.1"]["name"] == "Alcohol dehydrogenase"
    # multi-line DE concatenates directly, trailing dots stripped per
    # line (expasy.py:248-251)
    assert rows["1.1.1.2"]["name"] == (
        "Alcohol dehydrogenase (NADP(+)). This enzyme spanstwo DE lines"
    )
    # multi-line CA concatenates into the definition (expasy.py:252-255)
    assert rows["1.1.1.1"]["definition"] == (
        "(1) a primary alcohol + NAD(+) = an aldehyde + NADH"
        "(2) a secondary alcohol + NAD(+) = a ketone + NADH"
    )
    # deleted + transferred entries are obsolete, nameless
    assert rows["1.1.1.5"]["is_obsolete"] and rows["1.1.1.5"]["name"] is None
    assert rows["1.1.1.74"]["is_obsolete"]
    assert not rows["1.1.1.1"]["is_obsolete"]


def test_parents(tables):
    got = {(r["child"], r["parent"]) for r in tables["parents"].collect()}
    assert got == {
        # tree edges (give_edge: '-'/space-stripped levels)
        ("1.1", "1"),
        ("1.1.1", "1.1"),
        # leaf records parent to id-minus-last-level (expasy.py:227-230)
        ("1.1.1.1", "1.1.1"),
        ("1.1.1.2", "1.1.1"),
    }
    # top-level classes (1, 2) have no parent row
    assert "2" not in {c for c, _ in got}


def test_synonyms(tables):
    syn = {}
    for r in tables["synonyms"].collect():
        syn.setdefault(r["identifier"], set()).add(r["text"])
    assert syn == {"1.1.1.1": {"Aldehyde reductase", "ADH"}}


def test_replaced_by_sorted_transfer_targets(tables):
    got = [
        (r["identifier"], r["replacement_id"])
        for r in tables["replaced_by"].collect()
    ]
    assert sorted(got) == [
        ("1.1.1.5", "1.1.1.198"),
        ("1.1.1.5", "1.1.1.227"),
        ("1.1.1.5", "1.1.1.228"),
    ]


def test_member_and_enables_relations(tables):
    got = {
        (r["identifier"], r["relation_id"], r["target_prefix"], r["target_id"])
        for r in tables["relations"].collect()
    }
    # PR → prosite, DR → uniprot (multi-entry lines split on ';',
    # expasy.py:258-277), ec2go → GO enables for MAPPED active terms
    # only; target prefixes stored lowercase (catalog fold invariant)
    assert got == {
        ("1.1.1.1", "0002351", "prosite", "PS00059"),
        ("1.1.1.1", "0002351", "uniprot", "P07327"),
        ("1.1.1.1", "0002351", "uniprot", "P28469"),
        ("1.1.1.1", "0002351", "uniprot", "Q5RBP7"),
        ("1.1.1.1", "0002327", "go", "0004022"),
    }


def test_plugin_registration(spark, tmp_path):
    from pyobo_spark import plugins

    assert plugins.has_nomenclature_plugin("eccode")
    (tmp_path / "enzyme.dat").write_text(ENZYME_DAT)
    out = plugins.run_nomenclature_plugin(
        spark, "ECCODE", path=str(tmp_path / "enzyme.dat")
    )
    ids = {r["identifier"] for r in out["terms"].collect()}
    assert "1.1.1.1" in ids and "1" not in ids  # no tree file passed
    out["unpersist"]()


def test_crlf_dump_parses_all_records(spark, tmp_path):
    """A CRLF-line-ending enzyme.dat never matches the '//\\n' record
    separator and arrives as ONE chunk — the chunk parser must still
    split records at ID lines (single-task degradation, like the
    documented .gz caveat) instead of merging everything into one
    garbage term keyed by the last ID."""
    crlf = ENZYME_DAT.replace("\n", "\r\n")
    (tmp_path / "enzyme_crlf.dat").write_bytes(crlf.encode())
    t = X.read_expasy(spark, str(tmp_path / "enzyme_crlf.dat"))
    rows = {r["identifier"]: r for r in t["terms"].collect()}
    assert set(rows) == {"1.1.1.1", "1.1.1.2", "1.1.1.5", "1.1.1.74"}
    assert rows["1.1.1.1"]["name"] == "Alcohol dehydrogenase"
    assert rows["1.1.1.5"]["is_obsolete"]
    syn = {r["text"] for r in t["synonyms"].collect()}
    assert syn == {"Aldehyde reductase", "ADH"}
    t["unpersist"]()


def test_transfer_parser_golden():
    # expasy.py:293-294 doctest parity
    assert X._parse_transfer(
        "Transferred entry: 1.1.1.198, 1.1.1.227 and 1.1.1.228."
    ) == ["1.1.1.198", "1.1.1.227", "1.1.1.228"]
