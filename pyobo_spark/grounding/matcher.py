"""Mention detection over the interleaved corpus — the north-rule core.

Pipeline (SURVEY.md §3.2 Spark lifecycle):
  documents(doc_id, spans[]) → posexplode (span order preserved as
  span_idx) → filter kind='text' (media spans bypass untouched — the
  span-sequence invariant is checked on the full set) → Arrow-batched
  mapInPandas matcher with the BROADCAST Aho-Corasick automaton →
  mentions(doc_id, span_idx, token_start, token_end, matched_text,
  curie, score) → best-match window (top-1 per span position, the
  engine's only top-k — reference ner/normalizer.py:55).

Scale notes:
- The automaton is broadcast once (pickled dict-trie); corpus rows never
  shuffle for the match itself — it's a map-only stage.
- mapInPandas receives Arrow record batches; the Python work is a single
  pass per token (Aho-Corasick is linear), no per-row Python UDF calls.
- The best-match window shuffles on (doc_id, span_idx, token_start) —
  bounded by mention count, not corpus size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dictionary import AhoCorasick, fold_text

MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("token_start", T.IntegerType()),
        T.StructField("token_end", T.IntegerType()),
        T.StructField("matched_text", T.StringType()),
        T.StructField("curie", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def explode_spans(documents: DataFrame) -> DataFrame:
    """posexplode keeps span order as span_idx — the per-row invariant
    (kind, text, media_ref, order) is reassembled from exactly this."""
    return documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def reassemble_spans(exploded: DataFrame) -> DataFrame:
    """Inverse of explode_spans: sort_array on (span_idx, struct) restores
    the original span sequence — used by the span-sequence equality test."""
    return (
        exploded.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "span_idx",
                        F.struct("kind", "text", "media_ref", "offset").alias("span"),
                    )
                )
            ).alias("pairs")
        )
        .select(
            "doc_id",
            F.expr("transform(pairs, p -> p.span)").alias("spans"),
        )
    )


def match_text_spans(
    text_spans: DataFrame, automaton_broadcast, fold: bool = True
) -> DataFrame:
    """Run the broadcast matcher (AhoCorasick or HybridMatcher — anything
    with .search(tokens)) over (doc_id, span_idx, text) rows.

    fold=False skips Python-side text folding — use when the text is
    already folded (e.g. lower() applied JVM-side upstream, ASCII corpus);
    halves the Python cost of the hot loop."""

    return _run_matcher(text_spans, automaton_broadcast, fold, best_per_site=False)


def match_text_spans_best(
    text_spans: DataFrame, automaton_broadcast, fold: bool = True
) -> DataFrame:
    """match_text_spans + best-match resolved INSIDE the UDF: every
    candidate for a given (doc, span, token_start) site is produced from
    the same input row, so top-1 selection needs no shuffle at all —
    the window variant (best_match) exists for cross-row generality, but
    this is the scale path: map-only end to end."""
    return _run_matcher(text_spans, automaton_broadcast, fold, best_per_site=True)


def _run_matcher(
    text_spans: DataFrame, automaton_broadcast, fold: bool, best_per_site: bool
) -> DataFrame:
    def matcher(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = automaton_broadcast.value
        search = ac.search
        do_fold = fold
        for pdf in batches:
            doc_ids: list = []
            span_idxs: list = []
            starts: list = []
            ends: list = []
            texts: list = []
            curies: list = []
            scores: list = []
            for doc_id, span_idx, text in zip(
                pdf["doc_id"].tolist(),
                pdf["span_idx"].tolist(),
                pdf["text"].tolist(),
            ):
                if not text:
                    continue
                tokens = (fold_text(text) if do_fold else text).split(" ")
                if best_per_site:
                    # keep the top candidate per start site: score desc,
                    # match length desc, curie asc (same order as
                    # best_match's window)
                    best: dict[int, tuple] = {}
                    for start, end, curie, score in search(tokens):
                        key = (-score, -(end - start), curie)
                        if start not in best or key < best[start][0]:
                            best[start] = (key, end, curie, score)
                    matches = [
                        (s, e, c, sc) for s, (_, e, c, sc) in best.items()
                    ]
                else:
                    matches = list(search(tokens))
                for start, end, curie, score in matches:
                    doc_ids.append(doc_id)
                    span_idxs.append(span_idx)
                    starts.append(start)
                    ends.append(end)
                    texts.append(" ".join(tokens[start:end]))
                    curies.append(curie)
                    scores.append(score)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids, "span_idx": span_idxs,
                    "token_start": starts, "token_end": ends,
                    "matched_text": texts, "curie": curies, "score": scores,
                }
            )

    return text_spans.select(
        F.col("doc_id").cast("string"), "span_idx", "text"
    ).mapInPandas(matcher, schema=MATCH_SCHEMA)


COUNT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("curie", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def match_mention_counts(
    text_spans: DataFrame, matcher_broadcast, fold: bool = True
) -> DataFrame:
    """Map-side-combined mention counting: the UDF emits (doc_id, curie,
    partial_count) instead of one row per occurrence — the partial
    aggregation happens INSIDE the Arrow batch (classic map-side combine),
    so the shuffle carries ~|distinct (doc, curie)| rows, not |mentions|.
    Finish with groupBy(doc_id, curie).sum. Identical results to
    match_text_spans + groupBy count, at a fraction of the transfer and
    shuffle volume — this is the hot path for corpus-scale counter
    stages (db_output_helper counters, getters.py:477-571)."""
    partial = match_mention_counts_partial(text_spans, matcher_broadcast, fold)
    return partial.groupBy("doc_id", "curie").agg(F.sum("n").alias("n_mentions"))


def match_mention_counts_partial(
    text_spans: DataFrame, matcher_broadcast, fold: bool = True
) -> DataFrame:
    """The map-only partial stage of match_mention_counts: (doc_id,
    curie, n) with per-document combine inside the Arrow batch and NO
    aggregation — streaming stateful consumers (applyInPandasWithState)
    take this directly, since Structured Streaming forbids an agg before
    the stateful operator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ac = matcher_broadcast.value
        search = ac.search
        do_fold = fold
        for pdf in batches:
            doc_ids: list = []
            curies: list = []
            ns: list = []
            for doc_id, text in zip(
                pdf["doc_id"].tolist(), pdf["text"].tolist()
            ):
                if not text:
                    continue
                tokens = (fold_text(text) if do_fold else text).split(" ")
                cnt: dict[str, int] = {}
                for _, _, curie, _ in search(tokens):
                    cnt[curie] = cnt.get(curie, 0) + 1
                if cnt:
                    doc_ids.extend([doc_id] * len(cnt))
                    curies.extend(cnt.keys())
                    ns.extend(cnt.values())
            yield pd.DataFrame({"doc_id": doc_ids, "curie": curies, "n": ns})

    return text_spans.select(
        F.col("doc_id").cast("string"), "text"
    ).mapInPandas(run, schema=COUNT_SCHEMA)


def best_match(mentions: DataFrame) -> DataFrame:
    """Top-1 per mention site — prefer higher score, then longer match,
    then lexicographically-smallest curie (deterministic tie-break).
    Mirrors grounder.get_best_match (ner/normalizer.py:55)."""
    w = Window.partitionBy("doc_id", "span_idx", "token_start").orderBy(
        F.desc("score"),
        F.desc(F.col("token_end") - F.col("token_start")),
        F.asc("curie"),
    )
    return (
        mentions.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def detect_mentions(
    documents: DataFrame, automaton_broadcast, keep_all: bool = False
) -> DataFrame:
    """documents(doc_id, spans[]) → best-match mentions (map-only: the
    per-site top-1 resolves inside the UDF, no shuffle)."""
    exploded = explode_spans(documents)
    text_spans = exploded.where(F.col("kind") == "text")
    if keep_all:
        return match_text_spans(text_spans, automaton_broadcast)
    return match_text_spans_best(text_spans, automaton_broadcast)


def mention_triples(mentions: DataFrame) -> DataFrame:
    """Materialize (subj, pred, obj) triples from grounded mentions."""
    return mentions.select(
        F.concat(F.lit("doc:"), F.col("doc_id")).alias("subject_curie"),
        F.lit("pyobo:mentions").alias("predicate_curie"),
        F.col("curie").alias("object_curie"),
    ).distinct()
