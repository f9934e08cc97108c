"""Property-based tests (hypothesis) for driver-side kernels — the
pure-python pieces that run inside Arrow UDFs, so property coverage here
covers every executor batch path."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyobo_spark.grounding.dictionary import (
    build_automaton,
    build_matcher,
    fold_text,
)
from pyobo_spark.normalize.curie import parse_one
from pyobo_spark.normalize.registry import Registry

REG = Registry.default()

STATUSES = {
    "ok", "empty", "blocklist", "not_curie", "unregistered_prefix",
    "unparsable_iri", "invalid_identifier",
}


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_one_total(raw):
    """The normalizer is total: never raises, always a known status, and
    ok-status implies a registered prefix."""
    prefix, identifier, status = parse_one(raw, REG)
    assert status in STATUSES
    if status == "ok":
        assert prefix in REG.records
        assert identifier is not None


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_fold_text_idempotent(s):
    folded = fold_text(s)
    assert fold_text(folded) == folded
    assert "  " not in folded
    assert folded == folded.strip()


@given(
    st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1, max_size=8),
        min_size=0, max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_hybrid_matcher_equals_automaton(tokens):
    """HybridMatcher and the pure Aho-Corasick automaton agree on every
    input for a mixed single/multi-word dictionary."""
    entries = [
        ("alpha", "a:1", "rdfs:label"),
        ("beta", "a:2", "rdfs:label"),
        ("alpha beta", "a:3", "rdfs:label"),
        ("beta beta gamma", "a:4", "oboInOwl:hasExactSynonym"),
    ]
    ac = build_automaton(entries)
    hm = build_matcher(entries)
    got_ac = sorted(ac.search(tokens))
    got_hm = sorted(hm.search(tokens))
    assert got_ac == got_hm


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_obo_escape_roundtrip(s):
    """Writer escaping → reader unescaping is lossless up to the
    reference's definition cleanup (tabs/newlines → single spaces)."""
    import re

    from pyobo_spark.sources.obo_reader import _clean_def, _unescape

    escaped = (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\t", "\\t")
    )
    # what the reader does to a def-quoted string
    out = _clean_def(escaped)
    expected = re.sub(r" {2,}", " ", s.replace("\n", " ").replace("\t", " ")).strip()
    # _clean_def collapses doubled spaces repeatedly; emulate
    while "  " in expected:
        expected = expected.replace("  ", " ")
    assert out == expected
