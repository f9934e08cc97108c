"""Version-string cleanup + prioritization.

Reference parity: ``utils/misc.py:78-118`` (``cleanup_version`` — the
ordered rule pipeline stripping version-IRI boilerplate down to a bare
version token) and ``utils/misc.py:158-215`` (``_prioritize_version`` —
injected version > graph data-version > date fallback, with static
rewrites and a known-bad blocklist).

Like the prefix registry (:mod:`.registry`), the rewrite/prefix tables
are DATA, not code — a snapshot of publicly documented version-IRI
conventions, kept to the entries our fixtures and common OBO ontologies
exercise. The pipeline semantics (ordering of the steps) are what's
faithfully reproduced.

These run driver-side: version metadata is one row per *ontology*
(dozens), never per-term or per-document, so a Python function is the
right altitude — there is nothing to distribute.
"""

from __future__ import annotations

import re
from datetime import datetime

__all__ = ["cleanup_version", "get_version_pins", "prioritize_version"]


def get_version_pins() -> dict[str, str]:
    """User-defined resource version pins from the PYOBO_VERSION_PINS
    env var — a JSON object of {prefix: version} strings (reference
    ``utils/ver.py:93-126``). Invalid JSON and non-string entries are
    dropped, not raised (tests/test_get_version.py)."""
    import json
    import os

    raw = os.getenv("PYOBO_VERSION_PINS")
    if not raw:
        return {}
    try:
        pins = json.loads(raw)
    except ValueError:
        return {}
    if not isinstance(pins, dict):
        return {}
    # fold keys to lowercase: the lookup prefix is always the stored
    # (lowercase) form, but users naturally pin by preferred casing
    return {
        p.lower(): v
        for p, v in pins.items()
        if isinstance(p, str) and isinstance(v, str)
    }

# full-string rewrites for static resources with bizarre version IRIs
_REWRITES = {
    "$Date: 2009/11/15 10:54:12 $": "2009-11-15",
    "http://www.w3.org/2006/time#2016": "2016",
    "https://purl.org/ontology/modalia#1.0.0": "1.0.0",
}

# per-ontology hard overrides (resource is static but mis-declares)
_STATIC_BY_PREFIX = {
    "orth": "2",
}

# strip-and-return: the version is whatever follows one of these IRIs
_IRI_PREFIXES = (
    "http://www.orpha.net/version",
    "http://purl.org/pav/",
    "http://www.w3.org/ns/prov-",
    "http://www.ebi.ac.uk/swo/version/",
    "http://purl.jp/bio/4/ontology/iobc/",
    "https://openenergyplatform.org/ontology/oeo/releases/",
    "https://w3id.org/amv/",
)

# strip, then keep only the first path segment (version/EXTRA/stuff)
_IRI_PREFIX_SPLITS = (
    "http://www.ebi.ac.uk/efo/releases/v",
    "http://semanticscience.org/ontology/sio/v",
    "http://nmrml.org/cv/v",
    "http://enanomapper.github.io/ontologies/releases/",
    "https://spec.industrialontologies.org/ontology/",
)

# versions that carry no information at all
_KNOWN_BAD = frozenset(
    {
        "http://purl.obolibrary.org/obo",
        "http://www.bioassayontology.org/bao/bao_complete",
        "https://vocabularies.wikipathways.org",
    }
)

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def cleanup_version(data_version: str, prefix: str) -> str:
    """Normalize a raw ``data-version`` value to a bare version token.

    Rule order matters and mirrors the reference exactly: quote strip →
    full-string rewrite → `.owl`/own-prefix/trailing-slash suffix strip →
    `releases/` prefix strip → known version-IRI prefix strip (whole
    remainder, or first path segment for the split family) → numeric
    heuristic → trailing ISO-date path segment → unchanged passthrough.
    """
    v = data_version.strip('"')
    if v in _REWRITES:
        return _REWRITES[v]

    if v.endswith(".owl"):
        v = v[: -len(".owl")]
    if v.endswith(prefix):
        v = v[: -len(prefix)]
    if v.endswith("/"):
        v = v[:-1]
    for lead in ("releases/", "release/"):
        if v.startswith(lead):
            v = v[len(lead):]

    for iri in _IRI_PREFIXES:
        if v.startswith(iri):
            return v[len(iri):]
    for iri in _IRI_PREFIX_SPLITS:
        if v.startswith(iri):
            return v[len(iri):].split("/")[0]

    if v.replace(".", "").isnumeric():
        return v

    # deepest path segment that parses as an ISO date wins
    for seg in reversed(v.split("/")):
        seg = seg.strip()
        if _DATE_RE.match(seg):
            try:
                datetime.strptime(seg, "%Y-%m-%d")
            except ValueError:
                continue
            return seg
    return v


def prioritize_version(
    data_version: str | None,
    prefix: str,
    injected_version: str | None = None,
    date: datetime | None = None,
) -> str | None:
    """Merge version signals: static override > injected (caller-passed)
    version > the graph's data-version > date fallback; known-bad values
    yield None. Mirrors ``_prioritize_version`` (utils/misc.py:158-215).
    """
    pins = get_version_pins()
    if prefix.lower() in pins:
        return pins[prefix.lower()]
    if prefix in _STATIC_BY_PREFIX:
        return _STATIC_BY_PREFIX[prefix]
    if injected_version:
        if injected_version in _KNOWN_BAD:
            return None
        return cleanup_version(injected_version, prefix)
    if data_version:
        if data_version in _KNOWN_BAD:
            return None
        return cleanup_version(data_version, prefix)
    if date is not None:
        return date.strftime("%Y-%m-%d")
    return None
