"""Term-keyed text embeddings + similarity lookup.

Reference parity: ``api/embedding.py:52-169`` (``get_text_embeddings_df``
— one row per named term with a fixed-dimension vector embedded from its
name/synonym text) and ``api/embedding.py:212-252``
(``get_embedding_similarity`` — cosine similarity between two terms'
vectors, plus nearest-term lookup).

The sentence-transformer model the reference loads is external ML and
not available in this container, so the embedding kernel here is a
deterministic sha256-derived stand-in (the same honest-stub pattern as
the multimodal decoder, ``multimodal.py``): component ``i`` of a term's
vector is ``byte_i(sha256(name)) / 255`` rounded to 4 dp. Everything
around the kernel — the (prefix, identifier, vector) artifact schema,
JVM-side hashing (codegen'd sha2/conv, zero Python), the broadcast
query join and windowed top-k in :mod:`.similarity` — is the real
production plumbing; swapping the kernel for an Arrow-batched model
call changes one expression.

Scale notes: embedding computation is map-only (no shuffle); similarity
lookups broadcast the (tiny) query side and reuse
``similarity.cosine_topk_bruteforce`` / ``cosine_topk_lsh`` so the
corpus side is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity

DEFAULT_DIM = 16


def _fake_embed(col, dim: int):
    """array<double> from sha256(text): byte_i/255 rounded 4dp. JVM-side
    (sha2 + conv are codegen'd) — no Python in the hot path."""
    hexed = F.sha2(col, 256)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.round(
            F.conv(F.substring(hexed, i * 2 + 1, 2), 16, 10).cast("double")
            / F.lit(255.0),
            4,
        ),
    )


def term_embeddings(terms: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """(prefix, identifier, curie, vector) for every named term — the
    reference's ``get_text_embeddings_df`` artifact (embedding keyed by
    term, computed from the term's name)."""
    return terms.where(F.col("name").isNotNull()).select(
        "prefix",
        "identifier",
        F.concat_ws(":", "prefix", "identifier").alias("curie"),
        _fake_embed(F.col("name"), dim).alias("vector"),
    )


def nearest_terms(
    embeddings: DataFrame, query_curies: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k cosine neighbors for each query term — reference
    ``get_embedding_similarity``'s nearest-lookup shape. The query side
    (a handful of CURIEs) joins against the artifact to pick up vectors,
    then broadcasts into the exact top-k kernel."""
    q = embeddings.select("curie", "vector").join(
        F.broadcast(query_curies), on="curie"
    )
    return similarity.cosine_topk_bruteforce(
        embeddings, q, k=k, id_col="curie", vec_col="vector"
    ).select(
        F.col("query_id").alias("query_curie"),
        F.col("neighbor_id").alias("neighbor_curie"),
        "cosine",
    )


def embedding_similarity(
    embeddings: DataFrame, curie_a: str, curie_b: str
) -> float | None:
    """Scalar cosine between two terms' vectors (reference
    ``get_embedding_similarity``, api/embedding.py:212-252). Point
    lookup — collects two rows."""
    two = embeddings.where(F.col("curie").isin([curie_a, curie_b]))
    pair = (
        two.where(F.col("curie") == curie_a)
        .select(F.col("vector").alias("va"))
        .crossJoin(
            two.where(F.col("curie") == curie_b).select(
                F.col("vector").alias("vb")
            )
        )
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    rows = pair.select((dot / (norm("va") * norm("vb"))).alias("cos")).collect()
    return rows[0]["cos"] if rows else None
