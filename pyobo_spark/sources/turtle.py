"""Pragmatic Turtle (TTL) reader for SKOS-style vocabularies.

Reference parity: ``struct/skos/reader.py`` reads Turtle via rdflib on
the driver (getters.py:195-201). rdflib isn't available here, so this
is a from-scratch parser for the Turtle SUBSET that SKOS vocabulary
files actually use (verified against the reference's own
tests/test_struct/test_skos/test.ttl):

- ``@prefix``/``@base`` directives (and SPARQL-style PREFIX/BASE),
- statements terminated by ``.`` at top level,
- predicate lists with ``;`` and object lists with ``,``,
- ``<iri>`` (relative IRIs resolved against @base), ``pfx:local``
  prefixed names, the ``a`` keyword,
- ``"literal"`` with ``@lang`` / ``^^datatype`` and \\-escapes.

NOT supported (skipped with a parse warning, never a crash): blank
nodes, collections, triple-quoted strings, numeric literals.

Distribution note: directive resolution needs the header, so the
statement SPLIT runs on the driver (vocabulary files are KB-MB); each
statement then expands to triples independently. The output is the
same (subject, predicate, object, is_literal, datatype, language,
parse_status) frame as the N-Triples reader, so ``skos_to_tables``
consumes either source unchanged.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_TOKEN = re.compile(
    r"""
    (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
    (?:\^\^(?P<dtype><[^>]*>|[A-Za-z][\w.-]*:[\w.-]+))?
    (?:@(?P<lang>[A-Za-z0-9-]+))?
  | (?P<punct>[;,.])
  | (?P<pname>[A-Za-z_][\w.-]*:[^\s;,]*|a\b)
    """,
    re.VERBOSE,
)

_DIRECTIVE = re.compile(
    r"^\s*(?:@prefix|PREFIX)\s+([\w.-]*):\s*<([^>]*)>\s*\.?\s*$"
    r"|^\s*(?:@base|BASE)\s*<([^>]*)>\s*\.?\s*$",
    re.IGNORECASE,
)


def _strip_comments(text: str) -> str:
    out: list[str] = []
    in_quote = in_iri = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\" and in_quote:
            out.append(text[i:i + 2])
            i += 2
            continue
        if c == '"' and not in_iri:
            in_quote = not in_quote
        elif c == "<" and not in_quote:
            in_iri = True
        elif c == ">" and not in_quote:
            in_iri = False
        # '#' inside <iri> (fragment) or "literal" is NOT a comment
        if c == "#" and not in_quote and not in_iri:
            while i < n and text[i] != "\n":
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _split_statements(text: str) -> list[str]:
    """Split on '.' at top level (outside quotes and IRIs)."""
    stmts: list[str] = []
    buf: list[str] = []
    in_quote = in_iri = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\" and in_quote:
            buf.append(text[i:i + 2])
            i += 2
            continue
        if c == '"' and not in_iri:
            in_quote = not in_quote
        elif c == "<" and not in_quote:
            in_iri = True
        elif c == ">" and not in_quote:
            in_iri = False
        if (
            c == "."
            and not in_quote
            and not in_iri
            # a dot inside a prefixed name (kim.hcrt:x) is not a
            # terminator: terminators are followed by whitespace/EOF
            and (i + 1 >= n or text[i + 1] in " \t\r\n")
        ):
            stmts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    if "".join(buf).strip():
        stmts.append("".join(buf))
    return stmts


_ESCAPE_RE = re.compile(r"\\(.)")
_ESCAPE_MAP = {"n": "\n", "t": "\t", '"': '"', "\\": "\\"}


def _unescape(s: str) -> str:
    # single-pass decode: sequential replace passes corrupt a literal
    # backslash before n/t, and sentinel swaps collide with sentinel
    # bytes in the data (hypothesis found \x00) — a regex scan has
    # neither problem
    return _ESCAPE_RE.sub(
        lambda m: _ESCAPE_MAP.get(m.group(1), m.group(1)), s
    )


def parse_turtle(text: str) -> list[dict]:
    """→ list of triple dicts matching the N-Triples reader's columns."""
    text = _strip_comments(text)
    prefixes: dict[str, str] = {}
    base = ""
    triples: list[dict] = []

    # SPARQL-style PREFIX/BASE lines carry no terminating '.', so they
    # must be consumed line-wise BEFORE the dot-based statement split
    kept_lines: list[str] = []
    for line in text.split("\n"):
        dm = _DIRECTIVE.match(line)
        if dm and not line.rstrip().endswith("."):
            if dm.group(2) is not None:
                prefixes[dm.group(1)] = dm.group(2)
            else:
                base = dm.group(3)
        else:
            kept_lines.append(line)
    text = "\n".join(kept_lines)

    def resolve(tok: str) -> str | None:
        if tok.startswith("<"):
            iri = tok[1:-1]
            # absolute = has a scheme (mailto:, urn:, http:, ...);
            # only scheme-less IRIs resolve against @base
            if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                return iri
            return base + iri
        if tok == "a":
            return RDF_TYPE
        if ":" in tok:
            p, local = tok.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return None

    for stmt in _split_statements(text):
        stmt = stmt.strip()
        if not stmt:
            continue
        d = _DIRECTIVE.match(stmt)
        if d:
            if d.group(2) is not None:
                prefixes[d.group(1)] = d.group(2)
            else:
                base = d.group(3)
            continue
        toks = list(_TOKEN.finditer(stmt))
        if not toks:
            continue
        subj = resolve(toks[0].group(0))
        if subj is None:
            triples.append(
                {"subject": toks[0].group(0), "predicate": None,
                 "object": None, "is_literal": False, "datatype": None,
                 "language": None, "parse_status": "unsupported_term"}
            )
            continue
        pred: str | None = None
        expect_pred = True
        for m in toks[1:]:
            if m.group("punct"):
                if m.group("punct") == ";":
                    expect_pred = True
                # ',' keeps current predicate; '.' handled by splitter
                continue
            if expect_pred:
                pred = resolve(m.group(0))
                if pred is None:
                    triples.append(
                        {"subject": subj, "predicate": m.group(0),
                         "object": None, "is_literal": False,
                         "datatype": None, "language": None,
                         "parse_status": "unsupported_term"}
                    )
                expect_pred = False
                continue
            if pred is None:
                continue
            if m.group("literal") is not None:
                triples.append(
                    {
                        "subject": subj,
                        "predicate": pred,
                        "object": _unescape(m.group("literal")[1:-1]),
                        "is_literal": True,
                        "datatype": (
                            resolve(m.group("dtype"))
                            if m.group("dtype")
                            else None
                        ),
                        "language": m.group("lang"),
                        "parse_status": "ok",
                    }
                )
            else:
                obj = resolve(m.group(0))
                if obj is None:
                    triples.append(
                        {
                            "subject": subj, "predicate": pred,
                            "object": m.group(0), "is_literal": False,
                            "datatype": None, "language": None,
                            "parse_status": "unsupported_term",
                        }
                    )
                else:
                    triples.append(
                        {
                            "subject": subj, "predicate": pred,
                            "object": obj, "is_literal": False,
                            "datatype": None, "language": None,
                            "parse_status": "ok",
                        }
                    )
    return triples


def read_turtle(spark: SparkSession, path: str) -> DataFrame:
    """Turtle file → the N-Triples reader's triple frame (feed straight
    into ``skos_to_tables``)."""
    from pyspark.sql import types as T

    with open(path, encoding="utf-8") as fh:
        rows = parse_turtle(fh.read())
    schema = T.StructType(
        [
            T.StructField("subject", T.StringType()),
            T.StructField("predicate", T.StringType()),
            T.StructField("object", T.StringType()),
            T.StructField("is_literal", T.BooleanType()),
            T.StructField("datatype", T.StringType()),
            T.StructField("language", T.StringType()),
            T.StructField("parse_status", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
