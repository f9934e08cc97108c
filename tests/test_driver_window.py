"""Pin the driver-window composition (VERDICT r05 #2).

The correctness harness checks exactly the FIRST 50 entries of
``queries()`` (insertion order) against ``oracle_sql()``. The window
composition is therefore load-bearing governance state: an accidental
dict reorder could silently swap a driver-verified query out of the
window. These tests make the invariant self-enforcing:

(a) every window entry is oracle-backed (the driver can three-way-check
    rows + schema + hash for all 50);
(b) the window equals the checked-in manifest
    ``tests/driver_window_manifest.txt`` EXACTLY, order included — any
    future rotation must edit the manifest in the same diff, making the
    change deliberate and reviewable.

No SparkSession needed — this is pure registry introspection.
"""

from __future__ import annotations

from pathlib import Path

from pyobo_spark import queries as Q

WINDOW_SIZE = 50
MANIFEST = Path(__file__).parent / "driver_window_manifest.txt"


def _window() -> list[str]:
    return list(Q.QUERIES)[:WINDOW_SIZE]


def test_window_entries_all_oracle_backed():
    missing = [n for n in _window() if n not in Q.ORACLES]
    assert missing == [], (
        f"driver-window entries without an oracle (the driver would "
        f"record only a weak rows-only check): {missing}"
    )


def test_window_matches_manifest_exactly():
    manifest = MANIFEST.read_text().split()
    assert len(manifest) == WINDOW_SIZE
    assert _window() == manifest, (
        "the first 50 queries() entries no longer match "
        "tests/driver_window_manifest.txt — if this rotation is "
        "deliberate, update the manifest in the same commit"
    )


def test_manifest_entries_exist_and_are_unique():
    manifest = MANIFEST.read_text().split()
    assert len(set(manifest)) == len(manifest)
    unknown = [n for n in manifest if n not in Q.QUERIES]
    assert unknown == []


def test_registry_and_entrypoint_agree():
    """__spark_entry__.queries()/oracle_sql() must expose the same
    registry the manifest pins (the driver imports the entrypoint, not
    pyobo_spark.queries directly)."""
    import __spark_entry__ as E

    assert list(E.queries()) == list(Q.QUERIES)
    assert E.oracle_sql() == Q.ORACLES
