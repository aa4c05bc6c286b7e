"""Curation operators: deterministic stratified sampling, benchmark
decontamination, Gopher-style repetition stats — correctness vs plain
pandas recomputation + the plan shapes that make them 100TB-safe."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cld2_spark.operators.curation import (contaminated_ids, decontaminate,
                                           repetition_stats, sample_hash,
                                           stratified_sample)


def _coin(salt: str, i) -> int:
    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16) % 1_000_000


def test_stratified_sample_matches_reference_coin(spark):
    pdf = pd.DataFrame({
        "doc_id": np.arange(4000, dtype=np.int64),
        "stratum": np.array(["a", "b", "c", "d"])[np.arange(4000) % 4],
    })
    rates = {"a": 0.5, "b": 1.0, "c": 0.0}
    got = (stratified_sample(spark.createDataFrame(pdf), "stratum", rates,
                             id_col="doc_id", salt="s1", default_rate=0.2)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    thr = pdf["stratum"].map(lambda s: int(rates.get(s, 0.2) * 1_000_000))
    coins = pdf["doc_id"].map(lambda i: _coin("s1", i))
    want = pdf[coins < thr].reset_index(drop=True)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    # rate sanity: stratum b fully kept, c fully dropped
    assert (got[got.stratum == "b"].shape[0] == 1000)
    assert (got[got.stratum == "c"].shape[0] == 0)
    kept_a = got[got.stratum == "a"].shape[0]
    assert 400 < kept_a < 600  # ~50% of 1000


def test_stratified_sample_is_stable_under_growth(spark):
    """Membership is a pure function of (salt, id): adding rows or
    repartitioning never flips a previously-kept row."""
    pdf = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64),
                        "stratum": ["x"] * 1000})
    small = stratified_sample(spark.createDataFrame(pdf), "stratum",
                              {"x": 0.3}, salt="g").toPandas()
    grown = pd.concat([pdf, pd.DataFrame(
        {"doc_id": np.arange(1000, 3000, dtype=np.int64),
         "stratum": ["x"] * 2000})])
    big = stratified_sample(spark.createDataFrame(grown).repartition(7),
                            "stratum", {"x": 0.3}, salt="g").toPandas()
    assert set(small.doc_id) == set(big[big.doc_id < 1000].doc_id)


def test_stratified_sample_plan_no_shuffle(spark):
    df = spark.range(100).selectExpr("id AS doc_id", "'x' AS stratum")
    plan = (stratified_sample(df, "stratum", {"x": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Python" not in plan


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog every day"),
        (1, "completely unrelated content about spark query planning"),
        # shares an 8-gram window with doc 0:
        (2, "note the quick brown fox jumps over the lazy dog appears"),
        (3, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_contaminated_ids_exact(spark):
    docs = _docs(spark)
    bench = docs.where("doc_id = 0")
    got = (contaminated_ids(docs, bench, n=8).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 0 (11 tokens) self-hits on all 4 of its distinct 8-grams;
    # doc 2 shares the 9-token run "the quick ... dog" with doc 0, whose
    # two 8-gram windows both occur in doc 0
    assert got.doc_id.tolist() == [0, 2]
    assert got.loc[0, "n_hits"] == 4
    assert got.loc[1, "n_hits"] == 2
    clean = decontaminate(docs, bench, n=8).toPandas()
    assert sorted(clean.doc_id.tolist()) == [1, 3]


def test_contaminated_plan_broadcasts_bench(spark):
    docs = _docs(spark)
    plan = (contaminated_ids(docs, docs.where("doc_id = 0"), n=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_repetition_stats_exact(spark):
    rows = [
        # 4 sentences, 'aa bb' repeated: dup lines 'aa bb' x3 -> c=3
        (0, "aa bb. aa bb. aa bb. cc dd"),
        (1, "xx yy. zz ww"),        # no duplicates
        (2, "solo"),                # single token: no 2-gram row (null)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = (repetition_stats(df).toPandas()
           .sort_values("doc_id").set_index("doc_id"))
    # doc 0: lines [aa bb, aa bb, aa bb, cc dd] -> 2 dups of 4
    assert out.loc[0, "dup_line_frac"] == 0.5
    assert out.loc[0, "dup_line_char_frac"] == (2 * 5) / (3 * 5 + 5)
    # top 2-gram of doc 0 is 'bb. aa' x2? tokens: aa bb. aa bb. aa bb. cc dd
    # most frequent 2-gram: 'aa bb.' (x3), len 6 -> 18 / len(text)
    assert abs(out.loc[0, "top_2gram_char_frac"]
               - 3 * len("aa bb.") / len("aa bb. aa bb. aa bb. cc dd")) < 1e-12
    assert out.loc[1, "dup_line_frac"] == 0.0
    assert np.isnan(out.loc[2, "top_2gram_char_frac"])


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from cld2_spark.operators.curation import dedup_paragraphs
    pdf = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": [
            "alpha beta. gamma. alpha beta",   # in-doc dup: pos2 loses
            "gamma. delta",                     # gamma lost to doc1
            "alpha beta. gamma",                # every line lost -> drop
            "  epsilon .zeta.",                 # trim + empty-segment filter
        ],
    })
    got = (dedup_paragraphs(spark.createDataFrame(pdf))
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert got["doc_id"].tolist() == [1, 2, 4]  # doc 3 dropped entirely
    assert got["text_dedup"].tolist() == [
        "alpha beta. gamma", "delta", "epsilon. zeta"]
    assert got["n_lines_kept"].tolist() == [2, 1, 2]


def test_dedup_paragraphs_plan_no_window(spark):
    """Winner selection must be a partial-aggregable groupBy (min struct),
    not a corpus-wide window sort."""
    from cld2_spark.operators.curation import dedup_paragraphs
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("line"), (F.col("id") % 7).cast("string"),
                 F.lit(". tail"), F.col("id").cast("string")).alias("text"))
    plan = (dedup_paragraphs(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan
    assert "partial_min" in plan or "partial min" in plan.lower()


def test_pack_sequences_greedy_exact(spark):
    from cld2_spark.operators.curation import pack_sequences
    # one block (n_blocks=1): 6 docs with token counts 5,5,5,20,3,9
    texts = [" ".join(["w"] * k) for k in (5, 5, 5, 20, 3, 9)]
    pdf = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                        "text": texts})
    got = (pack_sequences(spark.createDataFrame(pdf), budget=12,
                          n_blocks=1)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    # greedy @12: [5,5] | [5] (20 won't fit) | [20] oversized | [3,9]
    assert got["seq"].tolist() == [0, 0, 1, 2, 3, 3]
    assert got["tok_offset"].tolist() == [0, 5, 0, 0, 0, 3]
    assert got["n_tok"].tolist() == [5, 5, 5, 20, 3, 9]


def test_pack_sequences_budget_respected_sf(spark):
    from cld2_spark.operators.curation import pack_sequences
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = pack_sequences(docs, budget=128, n_blocks=8).toPandas()
    assert len(out) == 500
    fill = out.groupby(["block", "seq"])["n_tok"].sum()
    over = fill[fill > 128]
    if len(over):
        # only single-doc oversized sequences may exceed the budget
        counts = out.groupby(["block", "seq"]).size()
        assert (counts.loc[over.index] == 1).all()
    # offsets are exact prefix sums within each sequence
    out = out.sort_values(["block", "seq", "doc_id"])
    grp = out.groupby(["block", "seq"])["n_tok"]
    assert (out["tok_offset"].to_numpy()
            == (grp.cumsum() - out["n_tok"]).to_numpy()).all()


def test_mixture_sample_rates_and_membership(spark):
    from cld2_spark.operators.curation import mixture_sample
    # source a: 10 docs x 10 tok; source b: 10 x 10; source c unlisted
    rows = []
    for i in range(30):
        src = "abc"[i % 3]
        rows.append((i, src, " ".join(["w"] * 10)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    # budget 1000, weights a=0.05 (rate 0.5), b=2.0 (rate capped 1.0)
    got = (mixture_sample(spark.createDataFrame(pdf),
                          {"a": 0.05, "b": 2.0}, token_budget=1000,
                          salt="m1")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert set(got["source"]) <= {"a", "b"}          # c dropped entirely
    assert (got[got.source == "b"].keep_rate == 1.0).all()
    assert got[got.source == "b"].shape[0] == 10      # capped: all kept
    assert (got[got.source == "a"].keep_rate == 0.5).all()
    a_ids = [i for i in range(0, 30, 3) if _coin("m1", i) < 500_000]
    assert got[got.source == "a"]["doc_id"].tolist() == a_ids
    assert (got["n_tok"] == 10).all()


def test_tfidf_top_terms_ranking(spark):
    from cld2_spark.operators.curation import tfidf_top_terms
    pdf = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "source": ["g1", "g1", "g2", "g2"],
        "text": [
            "apple apple apple common",   # g1: apple tf3 df1
            "banana common common",       # g1: banana tf1
            "common cherry cherry",       # g2: cherry tf2 df1
            "common dd ee",               # len<3 terms dropped
        ],
    })
    got = (tfidf_top_terms(spark.createDataFrame(pdf), k=2)
           .toPandas().sort_values(["source", "rk"]).reset_index(drop=True))
    g1 = got[got.source == "g1"]
    # rank_key: apple 3e6/1, common 3e6/4=750000, banana 1e6/1
    assert g1["term"].tolist() == ["apple", "banana"]
    assert g1["tf"].tolist() == [3, 1] and g1["df"].tolist() == [1, 1]
    g2 = got[got.source == "g2"]
    assert g2["term"].tolist() == ["cherry", "common"]
    # df is corpus-wide: 'common' appears in all 4 docs
    assert g2["df"].tolist() == [1, 4]
    # score = tf * ln(n_docs/df); common has ln(4/4)=0
    assert g2["score"].tolist()[1] == 0.0
    assert "dd" not in set(got["term"]) and "ee" not in set(got["term"])


def test_incremental_dedup_bloom_identical_to_exact(spark):
    """The Bloom prefilter must be output-transparent: identical rows to
    incremental_dedup at a realistic bitmap, AND at a pathologically tiny
    bitmap (64 bits -> mostly false positives, everything routed through
    the exact verify). Also checks the definitely-unseen shortcut keeps
    rows no anti join ever saw."""
    import pandas as pd

    from cld2_spark.operators.dedup import (incremental_dedup,
                                            incremental_dedup_bloom)

    seen = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(100),
        "text": [f"curated doc {i}" for i in range(50)] * 2}))
    batch = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(1000, 1060),
        "text": [f"curated doc {i % 20}" for i in range(30)]   # dups
        + [f"fresh doc {i}" for i in range(30)]}))             # new

    exact = {(r["keep_id"], r["text_hash"], r["n_copies"])
             for r in incremental_dedup(batch, seen).collect()}
    assert len(exact) > 0
    for n_bits in (1 << 20, 64):
        got = {(r["keep_id"], r["text_hash"], r["n_copies"])
               for r in incremental_dedup_bloom(
                   batch, seen, n_bits=n_bits).collect()}
        assert got == exact, f"n_bits={n_bits}"


def test_duplicated_span_cuts_merges_planted_overlaps(spark):
    """Two docs share a 24-token run (=> 9 overlapping dup 16-windows
    that must merge into ONE cut of exactly the shared tokens) and a
    disjoint 16-token run far inside doc A (its own cut). Unique text
    yields no cuts."""
    import pandas as pd

    from cld2_spark.operators.dedup import duplicated_span_cuts

    shared24 = " ".join(f"tok{i}" for i in range(24))
    shared16 = " ".join(f"dup{i}" for i in range(16))
    fillerA = " ".join(f"fa{i}" for i in range(20))
    fillerB = " ".join(f"fb{i}" for i in range(20))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"{shared24} {fillerA} {shared16}",
                 f"{fillerB} {shared24}",
                 f"{shared16} " + " ".join(f"u{i}" for i in range(30))],
    }))
    got = {(r["doc_id"], r["cut_start"], r["cut_end"], r["n_tok"])
           for r in duplicated_span_cuts(docs, w=16).collect()}
    # doc1: shared24 at tokens 1-24 (9 merged windows), shared16 at 45-60
    # doc2: shared24 at 21-44; doc3: shared16 at 1-16
    assert got == {(1, 1, 24, 24), (1, 45, 60, 16),
                   (2, 21, 44, 24), (3, 1, 16, 16)}, got


class TestSampleExactK:
    def test_exactly_k_deterministic_and_consistent(self, spark):
        from cld2_spark.operators.curation import sample_exact_k
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        a = {r.doc_id for r in sample_exact_k(docs, 100).collect()}
        b = {r.doc_id for r in sample_exact_k(docs, 100).collect()}
        assert len(a) == 100 and a == b
        # consistent sampling: the 50-sample is a subset of the 100-sample
        c = {r.doc_id for r in sample_exact_k(docs, 50).collect()}
        assert c < a
        # a different salt redraws
        d = {r.doc_id for r in sample_exact_k(docs, 100, salt="other").collect()}
        assert d != a

    def test_plan_is_take_ordered_not_global_sort(self, spark):
        from cld2_spark.operators.curation import sample_exact_k
        docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        plan = (sample_exact_k(docs, 100)
                ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan


def test_rep_ngram_battery_hand_case(spark):
    from cld2_spark.operators.curation import rep_ngram_battery
    # "a b a b c": 2-grams = [a b, b a, a b, b c] -> top 'a b' c=2 gl=3;
    # dup grams: 'a b' (2 occurrences, 3 chars each). n_chars = 9.
    df = spark.createDataFrame([(1, "a b a b c")], "doc_id long, text string")
    got = {r.n: (r.top_ppm, r.dup_ppm)
           for r in rep_ngram_battery(df, ns=(2, 3)).collect()}
    assert got[2] == (2 * 3 * 1_000_000 // 9, 2 * 3 * 1_000_000 // 9)
    # 3-grams = [a b a, b a b, a b c] -> all unique; ties on c=1 break
    # to longest gl then largest gram -> any 5-char gram; dup mass 0
    assert got[3] == (1 * 5 * 1_000_000 // 9, 0)
    # docs shorter than n emit no row for that n
    short = spark.createDataFrame([(2, "x y")], "doc_id long, text string")
    ns = {r.n for r in rep_ngram_battery(short, ns=(2, 3, 4)).collect()}
    assert ns == {2}
