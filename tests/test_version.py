"""cleanup_version / prioritize_version rule parity against the
reference's own rule examples (utils/misc.py:24-118)."""

from __future__ import annotations

from datetime import datetime

from pyobo_spark.normalize.version import cleanup_version, prioritize_version


def test_full_string_rewrites():
    assert cleanup_version("$Date: 2009/11/15 10:54:12 $", "time") == "2009-11-15"
    assert cleanup_version("http://www.w3.org/2006/time#2016", "time") == "2016"
    assert (
        cleanup_version("https://purl.org/ontology/modalia#1.0.0", "dalia")
        == "1.0.0"
    )


def test_suffix_and_release_strips():
    # .owl suffix, own-prefix suffix, trailing slash, releases/ prefix
    assert cleanup_version("2024-01-01/go.owl", "go") == "2024-01-01"
    assert cleanup_version("releases/2023-05-10", "go") == "2023-05-10"
    assert cleanup_version("release/7.1", "x") == "7.1"
    assert cleanup_version('"1.2.3"', "x") == "1.2.3"


def test_version_iri_prefixes():
    assert (
        cleanup_version("http://www.ebi.ac.uk/swo/version/6.0", "swo") == "6.0"
    )
    assert (
        cleanup_version("http://purl.jp/bio/4/ontology/iobc/1.6.0", "iobc")
        == "1.6.0"
    )
    # split family keeps only the first path segment after the prefix
    assert (
        cleanup_version("http://nmrml.org/cv/v1.1.0/nmrCV", "nmrcv") == "1.1.0"
    )
    assert (
        cleanup_version(
            "http://www.ebi.ac.uk/efo/releases/v3.57.0/efo", "efo"
        )
        == "3.57.0"
    )


def test_numeric_and_date_heuristics():
    assert cleanup_version("1.2.3", "x") == "1.2.3"
    assert cleanup_version("42", "x") == "42"
    # deepest ISO-date path segment wins
    assert (
        cleanup_version("http://example.org/a/2021-03-04/b", "x")
        == "2021-03-04"
    )
    # no rule applies → unchanged passthrough
    assert cleanup_version("weird-version", "x") == "weird-version"


def test_prioritize_version():
    # static per-prefix override beats everything
    assert prioritize_version("9.9", "orth", injected_version="8") == "2"
    # injected beats data-version
    assert (
        prioritize_version("releases/2020-01-01", "go", injected_version="7.7")
        == "7.7"
    )
    # known-bad → None
    assert (
        prioritize_version("http://purl.obolibrary.org/obo", "x") is None
    )
    # date fallback
    assert (
        prioritize_version(None, "x", date=datetime(2022, 2, 3)) == "2022-02-03"
    )
    assert prioritize_version(None, "x") is None


def test_version_pins(monkeypatch):
    """PYOBO_VERSION_PINS env (utils/ver.py:93-126 + test_get_version):
    valid pins win over every other signal; faulty JSON / non-string
    entries are silently dropped."""
    from pyobo_spark.normalize.version import get_version_pins

    monkeypatch.delenv("PYOBO_VERSION_PINS", raising=False)
    assert get_version_pins() == {}
    monkeypatch.setenv("PYOBO_VERSION_PINS", "")
    assert get_version_pins() == {}
    monkeypatch.setenv("PYOBO_VERSION_PINS", "{not json")
    assert get_version_pins() == {}
    monkeypatch.setenv(
        "PYOBO_VERSION_PINS", '{"go": "2020-01-01", "chebi": 7}'
    )
    assert get_version_pins() == {"go": "2020-01-01"}
    # a pin overrides data-version, injected version, and static rewrites
    monkeypatch.setenv("PYOBO_VERSION_PINS", '{"orth": "99"}')
    assert prioritize_version("3", "orth", injected_version="4") == "99"
