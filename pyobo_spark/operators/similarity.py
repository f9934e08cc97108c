"""Similarity search over an embedding column (array<float>) —
brute-force cosine top-k baseline + an LSH-bucketed scale path.

Brute force: broadcast the (small) query set, JVM-side arithmetic only —
F.zip_with/F.aggregate compile to whole-stage-codegen'd expressions, no
Python in the hot path. At 100 TB the corpus side streams through a
map-only stage; the per-query top-k is a single shuffle on query_id
bounded by k × n_queries.

LSH path: random-hyperplane (sign) signatures with a fixed seed →
bucket-join; probes only matching buckets, trading recall for a
~(2^bits)× candidate reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    return df.withColumn(
        "_norm",
        F.sqrt(
            F.aggregate(
                F.col(vec), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        ),
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k per query.

    queries: subset of rows with the same shape. Broadcast inner side."""
    q = _with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec",
    ).withColumnRenamed("_norm", "qnorm")
    c = _with_norm(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
        ),
        "cvec",
    ).withColumnRenamed("_norm", "cnorm")
    dot = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 4).alias("cosine"),
            "rank",
        )
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    n_bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (int bucket id) per vector.

    Hyperplanes are generated deterministically on the driver and inlined
    as literal arrays → the sign computation stays JVM-side (no UDF)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    sig = None
    for b in range(n_bits):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit_plane, lambda a, p: a.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    return embeddings.select(
        F.col(id_col), F.col(vec_col), sig.alias("bucket")
    )


def multitable_signatures(
    embeddings: DataFrame,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All L hash-table signatures in ONE vectorized Arrow pass:
    batch matrix multiply (n_rows × dim) · (dim × L*b) in numpy, then
    bit-pack per table. Replaces L×b separate JVM aggregate expressions,
    whose literal-array plan trees were the bottleneck. Returns
    (vec_id, table, bucket)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_bits))
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "table": [], "bucket": []})
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bits = (mat @ planes > 0).reshape(len(pdf), n_tables, n_bits)
            buckets = (bits * weights).sum(axis=2)  # (n_rows, n_tables)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return embeddings.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("table", T.IntegerType()),
                T.StructField("bucket", T.LongType()),
            ]
        ),
    )


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: L independent
    hash tables; candidates = union of per-table bucket matches (standard
    recall amplification: hit prob 1-(1-p^b)^L). The candidate join key is
    (table, bucket) — high cardinality, skew-free; exact cosine is then
    computed only on candidates."""
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("embedding").alias("cvec"))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qvec"))
    c_sig = multitable_signatures(
        embeddings, n_bits=n_bits, n_tables=n_tables, dim=dim
    ).withColumnRenamed("vec_id", "neighbor_id")
    q_sig = multitable_signatures(
        queries, n_bits=n_bits, n_tables=n_tables, dim=dim
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        c_sig.join(F.broadcast(q_sig), on=["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = _with_norm(c, "cvec").withColumnRenamed("_norm", "cnorm")
    q = _with_norm(q, "qvec").withColumnRenamed("_norm", "qnorm")
    dot = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(c, on="neighbor_id").join(F.broadcast(q), on="query_id")
        .withColumn("cosine", dot / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )
