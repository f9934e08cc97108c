"""Unit tests for the Gopher corpus-filter operators
(operators/textstats.py; rules from Rae et al. 2021 §A1.1). The
oracle-backed registry queries cover the happy path at corpus scale;
these pin the hand-computable small cases and the token-poor
explode_outer degenerate path the corpus never exercises.
"""

from __future__ import annotations

import pytest

from pyobo_spark.operators import textstats


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_gopher_repetition_hand_computed(spark):
    # "a a a a a": 9 chars; 2-grams "a a" x4 -> 4*3/9; 3-grams x3 ->
    # 3*5/9; 4-grams x2 -> 2*7/9; the single 5-gram occurs once -> dup 0
    docs = spark.createDataFrame(
        [(1, "a a a a a")], "doc_id long, text string"
    )
    m = _rows(textstats.gopher_repetition(docs))[1]
    assert m["top_2gram_char_frac"] == pytest.approx(round(12 / 9, 4))
    assert m["top_3gram_char_frac"] == pytest.approx(round(15 / 9, 4))
    assert m["top_4gram_char_frac"] == pytest.approx(round(14 / 9, 4))
    assert m["dup_5gram_char_frac"] == 0.0


def test_gopher_repetition_dup_sums_all_duplicated_grams(spark):
    # "x y x y x y": "x y" x3 and "y x" x2 both duplicated at n=2;
    # dup_5: "x y x y x" and "y x y x y" occur once each -> 0
    docs = spark.createDataFrame(
        [(7, "x y x y x y")], "doc_id long, text string"
    )
    m = _rows(textstats.gopher_repetition(docs, top_ns=(2,), dup_ns=(2, 5)))[7]
    assert m["top_2gram_char_frac"] == pytest.approx(round(9 / 11, 4))
    assert m["dup_2gram_char_frac"] == pytest.approx(round((9 + 6) / 11, 4))
    assert m["dup_5gram_char_frac"] == 0.0


def test_gopher_repetition_keeps_token_poor_docs(spark):
    # 3 tokens: no 4/5-grams at all — explode_outer must keep the doc
    # with zero fractions instead of dropping it from the output
    docs = spark.createDataFrame(
        [(2, "x y z"), (3, "q")], "doc_id long, text string"
    )
    rows = _rows(textstats.gopher_repetition(docs))
    assert set(rows) == {2, 3}
    assert rows[2]["top_2gram_char_frac"] == pytest.approx(round(3 / 5, 4))
    assert rows[2]["top_4gram_char_frac"] == 0.0
    assert rows[2]["dup_5gram_char_frac"] == 0.0
    assert rows[3]["top_2gram_char_frac"] == 0.0


def test_gopher_quality_verdict(spark):
    passing = " ".join(
        ["the", "of"] + [f"word{i}" for i in range(58)]
    )  # 60 words, mean len ~4.9, 2 stopwords, all alphabetic
    too_short = "the of word word word"  # 5 words < 50
    symbols = " ".join(["the", "of"] + ["#"] * 58)  # symbol ratio 0.97
    docs = spark.createDataFrame(
        [(1, passing), (2, too_short), (3, symbols), (4, None), (5, "")],
        "doc_id long, text string",
    )
    rows = _rows(textstats.gopher_quality(docs))
    # null/empty text rows are excluded, not scored
    assert set(rows) == {1, 2, 3}
    assert rows[1]["passes"] is True
    assert rows[1]["n_words"] == 60
    assert rows[1]["n_stopwords"] == 2
    assert rows[2]["passes"] is False
    assert rows[3]["passes"] is False
    assert rows[3]["symbol_ratio"] == pytest.approx(round(58 / 60, 4))

def test_gopher_top_gram_is_most_frequent_not_max_product(spark):
    # 2-grams: "aa bb" x2 (len 5, product 10) vs "c d" x3 (len 3,
    # product 9). The Gopher rule scores the MOST FREQUENT gram — 9/29 —
    # not the max count*len product (a rarer-but-longer gram must lose).
    text = "aa bb aa bb c d c d c d"  # tokens alternate; recount below
    # tokens: aa bb aa bb c d c d c d -> 2-gram counts:
    #   "aa bb" x2, "bb aa" x1, "bb c" x1, "c d" x3, "d c" x2
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    m = {r["doc_id"]: r.asDict() for r in (
        textstats.gopher_repetition(docs, top_ns=(2,), dup_ns=(5,)).collect()
    )}[1]
    n_chars = len(text)
    assert m["top_2gram_char_frac"] == pytest.approx(round(3 * 3 / n_chars, 4))


def test_gopher_top_gram_count_tie_breaks_to_longer(spark):
    # "aaa b aaa c": 2-grams "aaa b", "b aaa", "aaa c" all count 1 —
    # tie breaks to the longest gram (len 5) deterministically
    docs = spark.createDataFrame([(1, "aaa b aaa c")], "doc_id long, text string")
    m = textstats.gopher_repetition(docs, top_ns=(2,), dup_ns=(5,)).collect()[0]
    assert m["top_2gram_char_frac"] == pytest.approx(round(5 / 11, 4))


def test_gopher_quality_stopwords_are_distinct(spark):
    # 'the the' is ONE qualifying stopword, not two ("contain at least
    # two of the following English words")
    filler = " ".join(f"word{i}" for i in range(58))
    docs = spark.createDataFrame(
        [(1, f"the the {filler}"), (2, f"the of {filler}")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in textstats.gopher_quality(docs).collect()}
    assert rows[1]["n_stopwords"] == 1
    assert rows[1]["passes"] is False
    assert rows[2]["n_stopwords"] == 2
    assert rows[2]["passes"] is True
