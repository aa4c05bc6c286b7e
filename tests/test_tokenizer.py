"""Distributed BPE tokenizer (operators/tokenizer): merge learning
against hand-computed truth, encode semantics, determinism, and the
plan shapes the 100 TB story depends on (one map-side-combinable
word-count shuffle for training; a zero-exchange single Arrow stage
for encoding)."""

from __future__ import annotations

import pytest

from cld2_spark.operators.tokenizer import (encode_corpus, encode_word,
                                            learn_merges, merge_word,
                                            merges_df, train_bpe,
                                            word_histogram)


def test_merge_word_left_to_right_non_overlapping():
    # "aaa" with pair (a,a): left-to-right gives [aa, a], not [a, aa]
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_word(["ab", "a", "b"], "a", "b") == ["ab", "ab"]


def test_learn_merges_hand_computed():
    # corpus: low*5  lower*2  newest*6  widest*3
    # classic Sennrich toy: (e,s) 6+3=9, (s,t) 9, (w,e) 2+6=8 ...
    # tie (e,s) vs (s,t) both 9 -> lexicographically smaller ('e','s')
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges(wc, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")  # 9 again, now as a single pair
    # after est: (l,o) 7 is the max remaining
    assert merges[2] == ("l", "o")


def test_encode_word_applies_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("low", ranks) == ["low"]
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("", ranks) == []
    # unseen chars pass through as single-char tokens
    assert encode_word("xyz", ranks) == ["x", "y", "z"]


def test_learn_merges_exhausts_cleanly():
    # tiny vocab: merges stop when every word is one symbol
    merges = learn_merges([("ab", 3)], 10)
    assert merges == [("a", "b")]


def test_word_histogram_is_partial_agg(spark):
    df = spark.createDataFrame(
        [(1, "a b b"), (2, "b c\tc")], "doc_id LONG, text STRING")
    hist = word_histogram(df, min_count=1, max_words=10)
    rows = [(r["word"], r["cnt"]) for r in hist.collect()]
    assert rows == [("b", 3), ("c", 2), ("a", 1)]
    plan = hist._jdf.queryExecution().executedPlan().toString()
    # map-side combine: a partial HashAggregate before the exchange
    assert "partial_count" in plan or "Partial" in plan


def test_encode_plan_zero_exchanges(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, None)], "doc_id LONG, text STRING")
    out = encode_corpus(df, [("a", "b")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1


def test_encode_corpus_values_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "ab ab cd"), (2, ""), (3, None)], "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in encode_corpus(
        df, [("a", "b"), ("ab", "c")]).collect()}
    # "ab ab cd" -> [ab][ab][c d] = 4 pieces over 3 words
    assert out[1]["n_tokens"] == 4
    assert out[1]["n_pieces_per_100_words"] == 4 * 100 // 3
    assert out[2]["n_tokens"] == 0 and out[3]["n_tokens"] == 0


def test_train_bpe_spark_matches_local(spark):
    """End-to-end: distributed histogram + learn == pure-local learn."""
    texts = ["the cat sat on the mat", "the bat and the cat", "mat cat"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING")
    got = train_bpe(df, num_merges=5, min_count=1, max_words=100)
    from collections import Counter
    c: Counter = Counter(w for t in texts for w in t.split(" ") if w)
    want = learn_merges(
        sorted(c.items(), key=lambda kv: (-kv[1], kv[0])), 5)
    assert got == want
    mdf = merges_df(spark, got)
    assert mdf.count() == 5
    assert [f.name for f in mdf.schema.fields] == [
        "rank", "left", "right", "merged"]


def test_min_count_and_cap_are_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "aa aa bb cc cc cc")], "doc_id LONG, text STRING")
    hist = word_histogram(df, min_count=2, max_words=1).collect()
    assert [(r["word"], r["cnt"]) for r in hist] == [("cc", 3)]
