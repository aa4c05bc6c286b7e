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


class TestUnigram:
    def test_exact_viterbi_hand_case(self):
        """Exact big-int scoring: with T=100, 'unready' under counts
        {un:20, ready:30, read:25, y:40, u:1,n:1,r:1,e:1,a:1,d:1} must
        pick (un, ready): 600/T^2 beats (un, read, y) 20000/T^3 iff
        600*T > 20000, i.e. T > 33.3 — so T=100 picks 2 pieces and a
        tiny T=30 corpus would pick 3. Both checked."""
        from cld2_spark.operators.tokenizer import viterbi_segment
        counts = {"un": 20, "ready": 30, "read": 25, "y": 40,
                  "u": 1, "n": 1, "r": 1, "e": 1, "a": 1, "d": 1}
        assert viterbi_segment("unready", counts, 100) == ("un", "ready")
        assert viterbi_segment("unready", counts, 30) == (
            "un", "read", "y")

    def test_tie_breaks_deterministic(self):
        """Equal scores: fewer pieces wins; then lexicographic."""
        from cld2_spark.operators.tokenizer import viterbi_segment
        # 'ab' as ('ab',) score 4/T vs ('a','b') 4/T^2 — fewer wins
        assert viterbi_segment("ab", {"ab": 4, "a": 2, "b": 2}, 8) == ("ab",)

    def test_unigram_matches_independent_oracle(self, spark):
        """Spark-trained vocab + encode == the second implementation in
        tools/freeze_expected.py (exact arithmetic, so bit-for-bit)."""
        import pyarrow.parquet as pq
        from pathlib import Path
        from cld2_spark.operators.tokenizer import (encode_corpus_unigram,
                                                    train_unigram,
                                                    unigram_vocab_df)
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        vocab = train_unigram(docs, vocab_size=120, n_iters=2,
                              min_count=2, max_words=20_000)
        frozen = pq.read_table(Path(__file__).parent / "data"
                               / "expected_unigram_vocab_sf0_01.parquet")
        got = {(r.piece, r.cnt)
               for r in unigram_vocab_df(spark, vocab).collect()}
        want = {(p, c) for p, c in zip(frozen["piece"].to_pylist(),
                                       frozen["cnt"].to_pylist())}
        assert got == want
        enc = {r.doc_id: r.tok_hash for r in
               encode_corpus_unigram(docs, vocab).collect()}
        fenc = pq.read_table(Path(__file__).parent / "data"
                             / "expected_unigram_encode_sf0_01.parquet")
        for did, th in zip(fenc["doc_id"].to_pylist(),
                           fenc["tok_hash"].to_pylist()):
            assert enc[did] == th


class TestWordPiece:
    def test_likelihood_ratio_prefers_reliable_pair(self):
        from cld2_spark.operators.tokenizer import learn_wordpiece
        # BPE would merge ('a','##b') first (count 15); WordPiece's
        # pc/(ca*cb) picks the rare-but-exclusive ('c','##d') pair
        merged, vocab = learn_wordpiece(
            [("abab", 10), ("ab", 5), ("cd", 3)], 1)
        assert merged == ["cd"]
        assert "cd" in vocab and "##d" in vocab

    def test_tie_breaks_to_smaller_pair(self):
        from cld2_spark.operators.tokenizer import learn_wordpiece
        # round 2 of the hand case: three pairs tie at ratio 1/25;
        # ('##a','##b') is the lexicographically smallest
        merged, _ = learn_wordpiece(
            [("abab", 10), ("ab", 5), ("cd", 3)], 2)
        assert merged == ["cd", "##ab"]

    def test_greedy_longest_match_and_unk(self):
        from cld2_spark.operators.tokenizer import encode_word_wordpiece
        vocab = {"a", "##b", "##bab", "cd", "##d", "c"}
        assert encode_word_wordpiece("abab", vocab) == ["a", "##bab"]
        assert encode_word_wordpiece("ab", vocab) == ["a", "##b"]
        # one unmatchable position poisons the WHOLE word (BERT rule)
        assert encode_word_wordpiece("abx", vocab) == ["[UNK]"]
        assert encode_word_wordpiece("zq", vocab) == ["[UNK]"]

    def test_merged_symbol_strips_continuation_prefix(self):
        from cld2_spark.operators.tokenizer import learn_wordpiece
        merged, vocab = learn_wordpiece([("xy", 4)], 1)
        assert merged == ["xy"]           # not 'x##y'
        # the word now encodes to its own single piece
        from cld2_spark.operators.tokenizer import encode_word_wordpiece
        assert encode_word_wordpiece("xy", vocab) == ["xy"]

    def test_spark_train_matches_frozen_fixture(self, spark):
        import pyarrow.parquet as pq
        from pathlib import Path
        from cld2_spark.operators.tokenizer import (
            encode_corpus_wordpiece, train_wordpiece, wordpiece_vocab_df)
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        merged, vocab = train_wordpiece(docs, num_merges=40, min_count=2,
                                        max_words=20_000)
        frozen = pq.read_table(Path(__file__).parent / "data"
                               / "expected_wordpiece_vocab_sf0_01.parquet")
        got = [(r.rank, r.token)
               for r in wordpiece_vocab_df(spark, merged)
               .orderBy("rank").collect()]
        want = list(zip(frozen["rank"].to_pylist(),
                        frozen["token"].to_pylist()))
        assert got == want
        enc = {r.doc_id: r.tok_hash for r in
               encode_corpus_wordpiece(docs, vocab).collect()}
        fenc = pq.read_table(Path(__file__).parent / "data"
                             / "expected_wordpiece_encode_sf0_01.parquet")
        for did, th in zip(fenc["doc_id"].to_pylist(),
                           fenc["tok_hash"].to_pylist()):
            assert enc[did] == th
