"""Corpus-trained bigram LM + stupid-backoff scoring (operators/ngram_lm).

Hand-computed integer goldens on a 4-doc corpus (both backoff branches),
cross-engine equality vs the live DuckDB oracle, and the plan shape
(broadcast model, map-side-combinable count aggs).
"""

import duckdb
import pytest

DOCS = [(1, "a b a b"), (2, "a b c"), (3, "c"), (4, "x a")]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_hand_golden_min_count_2(tiny):
    """min_count=2 prunes (b,a),(b,c),(x,a) and unigram x:
    uni a:4 b:3 c:2, N=9, bigram (a,b):3.
    d1 'a b a b': 750000 + 177777 + 750000 = 1677777 over 3.
    d2 'a b c':   750000 + 88888 over 2.
    d4 'x a':     backoff on a = 4*400000//9 = 177777 over 1."""
    from cld2_spark.operators.ngram_lm import lm_score
    rows = {r.doc_id: r for r in lm_score(tiny, min_count=2).collect()}
    assert set(rows) == {1, 2, 4}          # d3 has no bigrams
    assert rows[1].n_bigrams == 3
    assert rows[1].sum_score_ppm == 1_677_777
    assert rows[1].avg_score_ppm == 559_259
    assert rows[2].sum_score_ppm == 838_888
    assert rows[2].avg_score_ppm == 419_444
    assert rows[4].sum_score_ppm == 177_777


def test_hand_golden_min_count_1_no_backoff(tiny):
    """Self-scoring with min_count=1 never backs off: every scored
    bigram was counted. uni a:4 b:3 c:2 x:1.
    d1: 750000 + 333333 + 750000; d2: 750000 + 333333; d4: 1000000."""
    from cld2_spark.operators.ngram_lm import lm_score
    rows = {r.doc_id: r for r in lm_score(tiny, min_count=1).collect()}
    assert rows[1].sum_score_ppm == 1_833_333
    assert rows[2].sum_score_ppm == 1_083_333
    assert rows[4].sum_score_ppm == 1_000_000


def test_cross_engine_vs_duckdb(tiny, spark):
    from cld2_spark.operators.ngram_lm import lm_score, lm_score_oracle_sql
    got = {r.doc_id: (r.n_bigrams, r.sum_score_ppm, r.avg_score_ppm)
           for r in lm_score(tiny, min_count=2).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {int(r[0]): (int(r[1]), int(r[2]), int(r[3]))
            for r in con.sql(lm_score_oracle_sql(min_count=2)).fetchall()}
    assert got == want


def test_scoring_plan_broadcasts_model(spark, tiny):
    """The pruned model must travel broadcast (no shuffle of the corpus
    on gram keys) and the count aggs must show map-side partials."""
    from cld2_spark.operators.ngram_lm import lm_score
    plan = (lm_score(tiny, min_count=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    assert "SortMergeJoin" not in plan
