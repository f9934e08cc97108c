"""ExPASy ENZYME source — the controlled-flat-file converter idiom.

Seventh converter exemplar (reference ``src/pyobo/sources/expasy.py``):
a two-artifact source whose main dump (``enzyme.dat``) is a classic
SwissProt-style flat file — records terminated by ``//`` lines, fields
keyed by a 2-letter line code in columns 1-2, values from column 6 —
plus a fixed-column tree file (``enzclass.txt``) for the upper three
levels of the EC hierarchy. This line-code record grammar (also used by
UniProtKB, ExPASy PROSITE, EMBL) is the one reference-converter idiom
the earlier six exemplars (CSV / JSONL / GMT / record-split XML / HGNC
envelope / MeSH multi-file join) didn't cover.

Reference parity (``sources/expasy.py``):

- record grouping by ``ID`` line (``_group_by_id``, expasy.py:300-317);
- multi-line ``DE``/``CA`` concatenation with trailing-dot strip
  (expasy.py:248-255), ``AN`` synonyms (:256-257);
- ``DE Deleted entry.`` → obsolete term (expasy.py:241-242, 92-96);
- ``DE Transferred entry: …`` → obsolete + sorted replaced_by targets
  split on ','/'and' (``_parse_transfer``, expasy.py:286-297, 98-105);
- ``PR`` PROSITE domains and ``DR`` UniProt proteins → ``has_member``
  (RO:0002351) edges (expasy.py:135-150; struct/typedef.py:177-180);
- parent derived by dropping the last dotted level (expasy.py:227-230),
  tree levels from ``enzclass.txt`` cols 1-10 + name from col 12 with
  ``-``/space stripping (``give_edge``/``get_tree``, expasy.py:169-208);
- optional ``ec2go`` mapping → ``enables`` (RO:0002327) GO relations
  (expasy.py:151-154, 320-324; sources/utils.py get_go_mapping).

Spark-first shape: the reference accumulates dicts on the driver. Here
``enzyme.dat`` is record-split by the data source (``lineSep='//\\n'``
— one record per row, so a large dump distributes across executors;
note plain .gz is not splittable, decompress first), field extraction
is one Arrow-batched ``mapInPandas`` yielding a typed record row, and
every output table is a JVM-side explode/projection of that parsed
DataFrame — the tree file parses entirely in JVM expressions (no
Python at all on that path).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PREFIX = "ec"

#: has_member (struct/typedef.py:177-180) — routes PR/DR members
HAS_MEMBER = ("RO", "0002351")
#: enables (struct/typedef.py) — routes ec2go activities
ENABLES = ("RO", "0002327")

_REC_SCHEMA = T.StructType(
    [
        T.StructField("identifier", T.StringType(), False),
        T.StructField("name", T.StringType()),
        T.StructField("reaction", T.StringType()),
        T.StructField("deleted", T.BooleanType(), False),
        T.StructField("transfer_ids", T.ArrayType(T.StringType())),
        T.StructField("synonyms", T.ArrayType(T.StringType())),
        T.StructField("prosite", T.ArrayType(T.StringType())),
        T.StructField(
            "proteins",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("identifier", T.StringType()),
                        T.StructField("accession", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

_TRANSFER_SPLIT_RE = re.compile(r",\s*|\s+and\s+")  # expasy.py:283


def _parse_transfer(value: str) -> list[str]:
    """expasy.py:286-297 — 'Transferred entry: 1.1.1.198, 1.1.1.227 and
    1.1.1.228.' → sorted EC codes."""
    value = value[len("Transferred entry: "):].rstrip().rstrip(".")
    return sorted(
        x.strip().removeprefix("and").strip()
        for x in _TRANSFER_SPLIT_RE.split(value)
        if x.strip()
    )


def _parse_records_in_chunk(text: str) -> list:
    """All records in one text chunk → list of field tuples
    (expasy.py:238-277). Normally a chunk is ONE ``//``-terminated
    record (the ``lineSep='//\\n'`` split), but a CRLF-line-ending dump
    never matches that separator and arrives as a single chunk — so a
    new ``ID`` line always STARTS a new record here rather than
    overwriting the current one (correct though single-task, same
    degradation class as the documented .gz caveat). Preamble blocks
    (header CC lines before any ID) yield nothing."""
    out: list = []
    state: dict | None = None

    def flush():
        if state is not None:
            out.append(
                (
                    state["identifier"],
                    "".join(state["name_parts"]) or None,
                    "".join(state["reaction_parts"]) or None,
                    state["deleted"],
                    state["transfer_ids"],
                    state["synonyms"],
                    state["prosite"],
                    state["proteins"],
                )
            )

    for line in text.splitlines():
        line = line.strip()  # also drops the \r of CRLF files
        code, value = line[:2], line[5:]
        if code == "ID":
            flush()
            state = {
                "identifier": value.strip(),
                "name_parts": [],
                "reaction_parts": [],
                "deleted": False,
                "transfer_ids": None,
                "synonyms": [],
                "prosite": [],
                "proteins": [],
            }
        elif code == "//":
            # close the record NOW rather than waiting for the next ID:
            # lines between a terminator and the next ID (trailing
            # license block, inter-record commentary) must not be
            # appended to the previous record's fields
            flush()
            state = None
        elif state is None:
            continue  # preamble before the first ID line
        elif code == "DE":
            if value == "Deleted entry.":
                state["deleted"] = True
            elif value.startswith("Transferred entry: "):
                # multi-line transfers: the reference parses the first
                # line and gives up on continuations (expasy.py:244-246)
                value = value.strip().removesuffix("and").rstrip(",").strip()
                state["transfer_ids"] = _parse_transfer(value)
            else:
                # DE lines concatenate directly (expasy.py:248-251)
                state["name_parts"].append(value.rstrip("."))
        elif code == "CA":
            state["reaction_parts"].append(value.rstrip("."))
        elif code == "AN":
            state["synonyms"].append(value.rstrip("."))
        elif code == "PR":
            # 'PROSITE; PS00065;' → PS00065 (expasy.py:258-265)
            state["prosite"].append(
                value[len("PROSITE; "):].rstrip(";").strip()
            )
        elif code == "DR":
            for entry in value.replace(" ", "").split(";"):
                if not entry:
                    continue
                uniprot_id, accession = entry.split(",")
                # dicts, not tuples: Arrow's pandas→struct conversion
                # requires mapping-shaped cells
                state["proteins"].append(
                    {"identifier": uniprot_id, "accession": accession}
                )
    flush()
    return out


def _parse_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for text in pdf["value"]:
            rows.extend(_parse_records_in_chunk(text))
        yield pd.DataFrame(
            rows, columns=[f.name for f in _REC_SCHEMA.fields]
        )


def read_enzclass(
    spark: SparkSession, path: str, prefix: str = PREFIX
) -> dict[str, DataFrame]:
    """enzclass.txt → {terms, parents} for the top three EC levels.

    Entirely JVM-side (no Python): the fixed-column line format
    ('1. 1. 1.-  Name.') reduces to regexp cleanups — id from cols
    1-10 with spaces/dashes stripped (give_edge, expasy.py:169-179),
    name from col 12 with the trailing dot stripped (get_tree,
    expasy.py:188-190), parent by dropping the last dotted level."""
    lines = spark.read.text(path).where(F.col("value").rlike("^[0-9]"))
    ident = F.regexp_replace(
        F.regexp_replace(F.substring("value", 1, 10), r"[ \-]", ""),
        r"\.+$", "",
    )
    parsed = lines.select(
        ident.alias("identifier"),
        F.regexp_replace(
            F.trim(F.substring("value", 12, 1000)), r"\.$", ""
        ).alias("name"),
    )
    terms = parsed.select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        "name",
        F.lit(None).cast("string").alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    )
    parents = parsed.where(F.col("identifier").contains(".")).select(
        F.lit(prefix).alias("child_prefix"),
        F.col("identifier").alias("child"),
        F.lit(prefix).alias("parent_prefix"),
        F.regexp_replace("identifier", r"\.[^.]*$", "").alias("parent"),
    )
    return {"terms": terms, "parents": parents}


def read_ec2go(spark: SparkSession, path: str) -> DataFrame:
    """ec2go TSV ('EC:1.1.1.1 > GO:… activity ; GO:0004022') →
    (identifier, go_id) — JVM-side line parsing (sources/utils.py
    get_go_mapping; comment lines start with '!')."""
    lines = spark.read.text(path).where(~F.col("value").startswith("!"))
    return lines.select(
        F.regexp_extract("value", r"^EC:([0-9.\-]+) ", 1).alias("identifier"),
        F.regexp_extract("value", r"; GO:(\d{7})\s*$", 1).alias("go_id"),
    ).where((F.col("identifier") != "") & (F.col("go_id") != ""))


def read_expasy(
    spark: SparkSession,
    database_path: str,
    enzclass_path: str | None = None,
    ec2go_path: str | None = None,
    prefix: str = PREFIX,
) -> dict[str, DataFrame]:
    """enzyme.dat (+ optional enzclass.txt, ec2go) → canonical long
    tables {terms, synonyms, parents, relations, replaced_by} plus an
    ``unpersist()`` release callable for the parsed-record cache."""
    recs = (
        spark.read.text(database_path, lineSep="//\n")
        .mapInPandas(_parse_records, schema=_REC_SCHEMA)
        # five output tables consume the parse; without a cache each
        # would re-run the Python-side record parse of the whole dump
        .persist()
    )

    active = recs.where(
        ~F.col("deleted") & F.col("transfer_ids").isNull()
        & F.col("name").isNotNull()  # nameless entries skipped, :123-127
    )
    obsolete = recs.where(F.col("deleted") | F.col("transfer_ids").isNotNull())

    terms = active.select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        "name",
        F.col("reaction").alias("definition"),
        F.lit(None).cast("string").alias("namespace"),
        F.lit(False).alias("is_obsolete"),
        F.lit(None).cast("string").alias("species_id"),
    ).unionByName(
        obsolete.select(
            F.lit(prefix).alias("prefix"),
            "identifier",
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("string").alias("definition"),
            F.lit(None).cast("string").alias("namespace"),
            F.lit(True).alias("is_obsolete"),
            F.lit(None).cast("string").alias("species_id"),
        )
    )

    synonyms = active.select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        F.explode("synonyms").alias("text"),
        F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
        F.lit(None).cast("string").alias("type"),
        F.lit(None).cast("array<string>").alias("provenance"),
        F.lit(None).cast("string").alias("language"),
    )

    # leaf parent = id minus last level (expasy.py:227-230)
    parents = active.select(
        F.lit(prefix).alias("child_prefix"),
        F.col("identifier").alias("child"),
        F.lit(prefix).alias("parent_prefix"),
        F.regexp_replace("identifier", r"\.[^.]*$", "").alias("parent"),
    )

    hm_prefix, hm_id = HAS_MEMBER
    relations = active.select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        F.lit(hm_prefix).alias("relation_prefix"),
        F.lit(hm_id).alias("relation_id"),
        F.lit("prosite").alias("target_prefix"),
        F.explode("prosite").alias("target_id"),
    ).unionByName(
        active.select(
            F.lit(prefix).alias("prefix"),
            "identifier",
            F.lit(hm_prefix).alias("relation_prefix"),
            F.lit(hm_id).alias("relation_id"),
            F.lit("uniprot").alias("target_prefix"),
            F.explode("proteins").alias("p"),
        ).withColumn("target_id", F.col("p.identifier")).drop("p")
    )

    replaced_by = obsolete.where(F.col("transfer_ids").isNotNull()).select(
        F.lit(prefix).alias("prefix"),
        "identifier",
        F.lit(prefix).alias("replacement_prefix"),
        F.explode("transfer_ids").alias("replacement_id"),
    )

    out = {
        "terms": terms,
        "synonyms": synonyms,
        "parents": parents,
        "relations": relations,
        "replaced_by": replaced_by,
    }

    if enzclass_path is not None:
        tree = read_enzclass(spark, enzclass_path, prefix=prefix)
        out["terms"] = tree["terms"].unionByName(out["terms"])
        out["parents"] = tree["parents"].unionByName(out["parents"])

    if ec2go_path is not None:
        en_prefix, en_id = ENABLES
        ec2go = read_ec2go(spark, ec2go_path)
        out["relations"] = out["relations"].unionByName(
            # semi-join keeps only mapped ECs that exist as active terms
            # (reference indexes ec2go by parsed EC code, expasy.py:151)
            ec2go.join(
                active.select("identifier"), on="identifier", how="semi"
            ).select(
                F.lit(prefix).alias("prefix"),
                "identifier",
                F.lit(en_prefix).alias("relation_prefix"),
                F.lit(en_id).alias("relation_id"),
                # stored prefixes are canonically lowercase — the
                # catalog's fold-on-lookup decorator lowercases query
                # args, so an uppercase stored value would silently
                # never match
                F.lit("go").alias("target_prefix"),
                F.col("go_id").alias("target_id"),
            )
        )

    def unpersist(blocking: bool = False) -> None:
        """Release the parsed-record cache (the returned tables are
        derived selections — unpersisting them would not free it)."""
        recs.unpersist(blocking)

    out["unpersist"] = unpersist
    return out
