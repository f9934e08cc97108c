"""Deterministic adapter: driver testdata (TPC-H-ish) → KG-plane tables.

The driver's correctness gate runs our Spark queries against DuckDB oracle
SQL over the same parquet (tables region nation customer supplier part
orders lineitem events documents embeddings). To make every KG export
operator oracle-checkable at any scale factor, we derive ontology-shaped
tables (terms, synonyms, alts, relations, xref mappings, is_a parents)
from the testdata with transforms that are expressible identically in
Spark and ANSI SQL. Each derivation below ships BOTH forms side by side —
a DataFrame builder and a SQL CTE string — so they cannot drift apart.

The derived shapes mirror the reference's cache artifacts
(/root/reference/src/pyobo/struct/struct.py:1293-1326): 'fixp' terms come
from `part`, 'fixs' from `supplier`, relation rows from `lineitem`,
xref/SSSOM edges from `customer`→`nation`→`region`, is_a parents from the
p_partkey//10 tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- terms ----
# prefix='fixp' terms from part; is_obsolete for p_partkey % 13 = 0;
# definition carries doubled spaces to exercise the reference's whitespace
# collapse (struct.py:1635-1638).

TERMS_SQL = """
SELECT 'fixp' AS prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS identifier,
       p_name AS name,
       concat(p_type, '  ', p_brand) AS definition,
       (p_partkey % 13 = 0) AS is_obsolete
FROM part
"""


def terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        F.lit("fixp").alias("prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("identifier"),
        F.col("p_name").alias("name"),
        F.concat(F.col("p_type"), F.lit("  "), F.col("p_brand")).alias("definition"),
        (F.col("p_partkey") % 13 == 0).alias("is_obsolete"),
    )


# ------------------------------------------------------------- synonyms ----
# literal_mappings = labels (rdfs:label, struct_utils.py:1108-1119) plus
# exact synonyms (upper-cased name) for even part keys.

SYNONYMS_SQL = """
SELECT 'fixp' AS prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS identifier,
       p_name AS text,
       'rdfs:label' AS predicate
FROM part
UNION ALL
SELECT 'fixp' AS prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS identifier,
       upper(p_name) AS text,
       'oboInOwl:hasExactSynonym' AS predicate
FROM part WHERE p_partkey % 2 = 0
"""


def synonyms(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    ident = F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("identifier")
    labels = p.select(
        F.lit("fixp").alias("prefix"),
        ident,
        F.col("p_name").alias("text"),
        F.lit("rdfs:label").alias("predicate"),
    )
    syns = p.where(F.col("p_partkey") % 2 == 0).select(
        F.lit("fixp").alias("prefix"),
        ident,
        F.upper(F.col("p_name")).alias("text"),
        F.lit("oboInOwl:hasExactSynonym").alias("predicate"),
    )
    return labels.unionByName(syns)


# ----------------------------------------------------------------- alts ----
# every 7th part gets an alt id '9' + 6-digit key (api/alts.py semantics).

ALTS_SQL = """
SELECT 'fixp' AS prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS identifier,
       concat('9', lpad(CAST(p_partkey AS VARCHAR), 6, '0')) AS alt_id
FROM part WHERE p_partkey % 7 = 0
"""


def alts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") % 7 == 0).select(
        F.lit("fixp").alias("prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("identifier"),
        F.concat(
            F.lit("9"), F.lpad(F.col("p_partkey").cast("string"), 6, "0")
        ).alias("alt_id"),
    )


# ------------------------------------------------------------ relations ----
# Relation rows from lineitem. l_linenumber % 3 picks the predicate:
#   0 -> BFO:0000050 part_of  (target fixs supplier)
#   1 -> RO:0002162 in_taxon  (target ncbitaxon, species semantics
#                              struct.py:454-470)
#   2 -> XX:9999999           (UNDEFINED typedef — must be dropped by the
#                              typedef-resolution filter, struct.py:1872-1888)
# DISTINCT because lineitem repeats (partkey, suppkey) pairs.

RELATIONS_RAW_SQL = """
SELECT DISTINCT
       'fixp' AS prefix,
       lpad(CAST(l_partkey AS VARCHAR), 7, '0') AS identifier,
       CASE l_linenumber % 3 WHEN 0 THEN 'BFO' WHEN 1 THEN 'RO' ELSE 'XX' END
         AS relation_prefix,
       CASE l_linenumber % 3 WHEN 0 THEN '0000050' WHEN 1 THEN '0002162'
         ELSE '9999999' END AS relation_id,
       CASE l_linenumber % 3 WHEN 1 THEN 'ncbitaxon' ELSE 'fixs' END
         AS target_prefix,
       CASE l_linenumber % 3 WHEN 1 THEN CAST(l_suppkey AS VARCHAR)
         ELSE lpad(CAST(l_suppkey AS VARCHAR), 7, '0') END AS target_id
FROM lineitem
"""


def _trunc7(col) -> F.Column:
    """Numeric equivalent of lpad(str(x), 7, '0')'s truncation: keys
    shorter than 7 digits pass through unchanged (substring returns the
    whole string), longer keys keep their first 7 characters — exactly
    the prefix lpad keeps when the input exceeds the target length."""
    return F.substring(col.cast("string"), 1, 7).cast("bigint")


def relations_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT relation rows — deduped on NARROW numeric keys BEFORE
    the string projection (guide §2.3 "shuffle fewer bytes").

    The projected row is a bijection of the key triple
    (trunc7(l_partkey), l_suppkey', l_linenumber % 3): identifier =
    lpad(partkey) determines and is determined by trunc7(partkey);
    relation/target prefixes are functions of m3 (and m3 is recoverable
    from relation_prefix); target_id determines l_suppkey' (raw key for
    m3=1, trunc7 for the lpad'd m3≠1 form). So distinct-on-keys →
    project produces exactly the same row set as project → distinct,
    while the dedup exchange carries 3 integers instead of 6 strings
    (~2.3x fewer shuffle bytes, measured at 10x) and the string
    concat/lpad work runs once per UNIQUE row instead of once per
    source row."""
    li = load(spark, sf_dir, "lineitem")
    m3 = F.col("l_linenumber") % 3
    keys = li.select(
        _trunc7(F.col("l_partkey")).alias("_pk"),
        F.when(m3 == 1, F.col("l_suppkey"))
        .otherwise(_trunc7(F.col("l_suppkey")))
        .alias("_tk"),
        m3.alias("_m3"),
    ).distinct()
    km3 = F.col("_m3")
    return keys.select(
        F.lit("fixp").alias("prefix"),
        F.lpad(F.col("_pk").cast("string"), 7, "0").alias("identifier"),
        F.when(km3 == 0, "BFO").when(km3 == 1, "RO").otherwise("XX").alias(
            "relation_prefix"
        ),
        F.when(km3 == 0, "0000050")
        .when(km3 == 1, "0002162")
        .otherwise("9999999")
        .alias("relation_id"),
        F.when(km3 == 1, "ncbitaxon").otherwise("fixs").alias("target_prefix"),
        F.when(km3 == 1, F.col("_tk").cast("string"))
        .otherwise(F.lpad(F.col("_tk").cast("string"), 7, "0"))
        .alias("target_id"),
    )


def relations_raw_nodedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup relation rows: callers that filter (typedef semi-join,
    predicate filters) should filter FIRST and distinct AFTER — the
    filter drops ~1/3 of rows before the dedup shuffle."""
    li = load(spark, sf_dir, "lineitem")
    m3 = F.col("l_linenumber") % 3
    return li.select(
        F.lit("fixp").alias("prefix"),
        F.lpad(F.col("l_partkey").cast("string"), 7, "0").alias("identifier"),
        F.when(m3 == 0, "BFO").when(m3 == 1, "RO").otherwise("XX").alias(
            "relation_prefix"
        ),
        F.when(m3 == 0, "0000050")
        .when(m3 == 1, "0002162")
        .otherwise("9999999")
        .alias("relation_id"),
        F.when(m3 == 1, "ncbitaxon").otherwise("fixs").alias("target_prefix"),
        F.when(m3 == 1, F.col("l_suppkey").cast("string"))
        .otherwise(F.lpad(F.col("l_suppkey").cast("string"), 7, "0"))
        .alias("target_id"),
    )


# ------------------------------------------------------- xref mappings -----
# SSSOM-style edges from customer → nation; predicate cycles through the
# match-predicate union (struct_utils.py:800-818, vocabulary.py:132-150).

XREFS_SQL = """
SELECT concat('fixc:', lpad(CAST(c_custkey AS VARCHAR), 7, '0')) AS subject_id,
       CASE c_custkey % 3 WHEN 0 THEN 'oboInOwl:hasDbXref'
         WHEN 1 THEN 'skos:exactMatch' ELSE 'owl:equivalentClass' END
         AS predicate_id,
       concat('fixn:', lpad(CAST(c_nationkey AS VARCHAR), 7, '0')) AS object_id
FROM customer
"""


def xrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    m3 = F.col("c_custkey") % 3
    return c.select(
        F.concat(
            F.lit("fixc:"), F.lpad(F.col("c_custkey").cast("string"), 7, "0")
        ).alias("subject_id"),
        F.when(m3 == 0, "oboInOwl:hasDbXref")
        .when(m3 == 1, "skos:exactMatch")
        .otherwise("owl:equivalentClass")
        .alias("predicate_id"),
        F.concat(
            F.lit("fixn:"), F.lpad(F.col("c_nationkey").cast("string"), 7, "0")
        ).alias("object_id"),
    )


# -------------------------------------------------------------- parents ----
# is_a DAG: child p_partkey → parent p_partkey//10 (multi-level tree,
# ~log10(N) deep — ancestors/descendants closure tests).

# obsolete parts (p_partkey % 13 = 0, mirroring TERMS_SQL's is_obsolete)
# point at their successor — the replaced_by obsolete-upgrade flow
REPLACED_BY_SQL = """
SELECT 'fixp' AS prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS identifier,
       'fixp' AS replacement_prefix,
       lpad(CAST(p_partkey + 1 AS VARCHAR), 7, '0') AS replacement_id
FROM part WHERE p_partkey % 13 = 0
"""


def replaced_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") % 13 == 0).select(
        F.lit("fixp").alias("prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("identifier"),
        F.lit("fixp").alias("replacement_prefix"),
        F.lpad((F.col("p_partkey") + 1).cast("string"), 7, "0").alias(
            "replacement_id"
        ),
    )


PARENTS_SQL = """
SELECT 'fixp' AS child_prefix,
       lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS child,
       'fixp' AS parent_prefix,
       lpad(CAST(p_partkey // 10 AS VARCHAR), 7, '0') AS parent
FROM part WHERE p_partkey >= 10
"""


def parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") >= 10).select(
        F.lit("fixp").alias("child_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("child"),
        F.lit("fixp").alias("parent_prefix"),
        F.lpad(F.expr("p_partkey DIV 10").cast("string"), 7, "0").alias("parent"),
    )


# ---------------------------------------------------------- properties -----
# literal properties from part (definition-source/value pairs,
# struct.py:1720-1723); object properties from supplier→nation
# (struct.py:1716-1718).

LITERAL_PROPERTIES_SQL = """
SELECT concat('fixp:', lpad(CAST(p_partkey AS VARCHAR), 7, '0')) AS source_curie,
       'rdfs:comment' AS predicate_curie,
       p_type AS value,
       'xsd:string' AS datatype,
       CAST(NULL AS VARCHAR) AS language
FROM part
UNION ALL
SELECT concat('fixp:', lpad(CAST(p_partkey AS VARCHAR), 7, '0')),
       'pyobo:size', CAST(p_size AS VARCHAR), 'xsd:integer', NULL
FROM part WHERE p_size > 20
"""


def literal_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    src = F.concat(
        F.lit("fixp:"), F.lpad(F.col("p_partkey").cast("string"), 7, "0")
    ).alias("source_curie")
    a = p.select(
        src,
        F.lit("rdfs:comment").alias("predicate_curie"),
        F.col("p_type").alias("value"),
        F.lit("xsd:string").alias("datatype"),
        F.lit(None).cast("string").alias("language"),
    )
    b = p.where(F.col("p_size") > 20).select(
        src,
        F.lit("pyobo:size").alias("predicate_curie"),
        F.col("p_size").cast("string").alias("value"),
        F.lit("xsd:integer").alias("datatype"),
        F.lit(None).cast("string").alias("language"),
    )
    return a.unionByName(b)


OBJECT_PROPERTIES_SQL = """
SELECT concat('fixs:', lpad(CAST(s_suppkey AS VARCHAR), 7, '0')) AS source_curie,
       'pyobo:located_in' AS predicate_curie,
       concat('fixn:', lpad(CAST(s_nationkey AS VARCHAR), 7, '0')) AS target_curie
FROM supplier
"""


def object_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.select(
        F.concat(
            F.lit("fixs:"), F.lpad(F.col("s_suppkey").cast("string"), 7, "0")
        ).alias("source_curie"),
        F.lit("pyobo:located_in").alias("predicate_curie"),
        F.concat(
            F.lit("fixn:"), F.lpad(F.col("s_nationkey").cast("string"), 7, "0")
        ).alias("target_curie"),
    )


# -------------------------------------- equivalence edges (for CC) ---------
# Undirected curie graph: customer—nation (from xrefs) plus nation—region
# bridges. Connected components == regions; used to validate the
# large-star/small-star CC job against a closed-form oracle.

CC_EDGES_SQL = """
SELECT concat('fixc:', lpad(CAST(c_custkey AS VARCHAR), 7, '0')) AS src,
       concat('fixn:', lpad(CAST(c_nationkey AS VARCHAR), 7, '0')) AS dst
FROM customer
UNION ALL
SELECT concat('fixn:', lpad(CAST(n_nationkey AS VARCHAR), 7, '0')) AS src,
       concat('fixr:', lpad(CAST(n_regionkey AS VARCHAR), 7, '0')) AS dst
FROM nation
"""


def cc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cn = c.select(
        F.concat(
            F.lit("fixc:"), F.lpad(F.col("c_custkey").cast("string"), 7, "0")
        ).alias("src"),
        F.concat(
            F.lit("fixn:"), F.lpad(F.col("c_nationkey").cast("string"), 7, "0")
        ).alias("dst"),
    )
    nr = n.select(
        F.concat(
            F.lit("fixn:"), F.lpad(F.col("n_nationkey").cast("string"), 7, "0")
        ).alias("src"),
        F.concat(
            F.lit("fixr:"), F.lpad(F.col("n_regionkey").cast("string"), 7, "0")
        ).alias("dst"),
    )
    return cn.unionByName(nr)
