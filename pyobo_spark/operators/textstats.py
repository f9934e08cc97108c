"""Text analysis operators — language-ID, quality scoring, token counting,
document fingerprinting. All JVM-side (built-in functions) except the
n-gram language heuristic, which is an Arrow-batched pandas pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOPWORDS = ("the", "a", "of", "and", "to", "in", "was", "for", "by")


def token_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, stopword_ratio,
    quality_score) — all whole-stage-codegen expressions, zero Python."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_chars = F.length("text")
    avg_len = (n_chars - (n_tokens - 1)) / n_tokens  # chars minus separators
    stop_ratio = n_stop / n_tokens
    # simple quality heuristic: length band + stopword presence
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 400), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((stop_ratio > 0.01) & (stop_ratio < 0.6), F.lit(0.5)).otherwise(
            F.lit(0.0)
        )
    )
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def document_fingerprint(documents: DataFrame, mod: int = 1 << 31) -> DataFrame:
    """Rolling polynomial hash over tokens (Karp-Rabin style):
    acc = (acc*31 + crc32(token)) mod 2^31 — pure JVM F.aggregate."""
    toks = F.split(F.col("text"), " ")
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.crc32(t.cast("binary"))) % F.lit(mod),
    )
    return documents.select("doc_id", fp.alias("fingerprint"))


# character-trigram profiles for a tiny language-ID heuristic. Deliberately
# minimal — the point is the Spark plumbing (broadcast profile, Arrow batch
# scoring), not linguistic accuracy.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "ed ", " th", "er ", " wa"),
    "es": ("de ", " la", "os ", "ión", " el", "ar ", "ció", "la "),
    "fr": (" le", "es ", "de ", "ent", " de", "ion", "que", " la"),
    "de": ("der", "ein", "ich", "sch", "und", " un", "die", "en "),
    "zh": ("的", "了", "是", "在", "我", "有", "和", "人"),
}


PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # (pattern, replacement) — applied in order, all JVM regexp_replace
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\+?\d[\d\s()-]{7,}\d\b", "<PHONE>"),
)


def redact_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII redaction (emails, IPs, phone-like numbers) — standard
    pre-training scrub, pure whole-stage-codegen regexp_replace chain."""
    out = F.col(text_col)
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return documents.withColumn("text_redacted", out)


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score) — n-gram profile overlap, Arrow
    batched."""
    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds, scores = [], []
            for text in pdf["text"].astype(object):
                s = (text or "")[:500]
                grams = {s[i : i + 3] for i in range(max(len(s) - 2, 0))}
                best, best_score = "und", 0.0
                for lang, prof in profiles.items():
                    score = len(grams & prof) / len(prof)
                    if score > best_score:
                        best, best_score = lang, score
                preds.append(best)
                scores.append(round(best_score, 4))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "lang_pred": preds, "lang_score": scores}
            )

    return documents.select("doc_id", "text").mapInPandas(
        run,
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang_pred", T.StringType()),
                T.StructField("lang_score", T.DoubleType()),
            ]
        ),
    )
