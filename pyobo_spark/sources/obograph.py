"""OBO Graph JSON reader (reference: struct/obograph/ package, used at
getters.py:188-194) — Spark-first: spark.read.json + explode(nodes),
explode(edges). The format is the public OBO Graphs spec
(geneontology/obographs): {"graphs": [{"id", "nodes": [{"id", "lbl",
"type", "meta"}], "edges": [{"sub", "pred", "obj"}]}]}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_obograph(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Returns {'nodes': (graph_id, node_id, label, deprecated),
    'edges': (graph_id, subject, predicate, object)}."""
    raw = spark.read.option("multiLine", "true").json(path)
    graphs = raw.select(F.explode("graphs").alias("g"))

    from pyspark.sql import types as T

    def fields_of(df, struct_col):
        dt = df.schema[struct_col].dataType
        return {f.name: f.dataType for f in dt.fields} if isinstance(
            dt, T.StructType
        ) else {}

    def opt(df, struct_col, field, dtype="string"):
        """Schema-tolerant struct access: OBO-Graph JSON omits optional
        fields entirely when no record carries them, so the inferred
        schema may lack them — fall back to a typed null."""
        if field in fields_of(df, struct_col):
            return F.col(f"{struct_col}.{field}")
        return F.lit(None).cast(dtype)

    n = graphs.select(
        F.col("g.id").alias("graph_id"), F.explode("g.nodes").alias("n")
    )
    n_fields = fields_of(n, "n")
    meta_dt = n_fields.get("meta")
    deprecated = (
        F.coalesce(F.col("n.meta.deprecated"), F.lit(False))
        if isinstance(meta_dt, T.StructType)
        and "deprecated" in [f.name for f in meta_dt.fields]
        else F.lit(False)
    )
    nodes = n.select(
        "graph_id",
        opt(n, "n", "id").alias("node_id"),
        opt(n, "n", "lbl").alias("label"),
        deprecated.alias("deprecated"),
    )
    e = graphs.select(
        F.col("g.id").alias("graph_id"), F.explode("g.edges").alias("e")
    )
    edges = e.select(
        "graph_id",
        opt(e, "e", "sub").alias("subject"),
        opt(e, "e", "pred").alias("predicate"),
        opt(e, "e", "obj").alias("object"),
    )
    return {"nodes": nodes, "edges": edges}


def obograph_to_tables(
    nodes: DataFrame, edges: DataFrame, uri_prefix: str, prefix: str
) -> dict[str, DataFrame]:
    """Map OBO-Graph URIs to the engine's long tables: names + parents
    (is_a = 'is_a' predicate) + relation edges."""
    strip = lambda c: F.regexp_replace(c, f"^{uri_prefix}{prefix.upper()}_", "")  # noqa: E731
    names = nodes.where(
        F.col("node_id").startswith(f"{uri_prefix}{prefix.upper()}_")
    ).select(
        F.lit(prefix).alias("prefix"),
        strip(F.col("node_id")).alias("identifier"),
        F.col("label").alias("name"),
    )
    parents = edges.where(F.col("predicate") == "is_a").select(
        F.lit(prefix).alias("child_prefix"),
        strip(F.col("subject")).alias("child"),
        F.lit(prefix).alias("parent_prefix"),
        strip(F.col("object")).alias("parent"),
    )
    return {"names": names, "parents": parents}
