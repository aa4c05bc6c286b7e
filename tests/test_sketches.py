"""Winnowing fingerprints, count-min sketch, and per-group exact-k sampling.

Property tests for the three operators added alongside the exact/sketch
twin pattern: the MOSS winnowing guarantee, CMS over-estimation +
mergeability, and WindowGroupLimit-backed group sampling.
"""

from pyspark.sql import functions as F

from cld2_spark.operators.curation import sample_k_per_group
from cld2_spark.operators.sketches import (cms_build, cms_estimate,
                                           heavy_hitters, token_counts)
from cld2_spark.operators.textstats import winnow_fingerprints
from cld2_spark.plans.inspect import formatted_plan, plan_stats

K, W = 3, 4


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def _tokens(i, n, tag):
    # deterministic distinct filler tokens, disjoint across tags
    return [f"{tag}{i}x{j}" for j in range(n)]


def test_winnow_shared_run_guarantee(spark):
    """Schleimer et al. guarantee: any shared token run of length
    w + k - 1 produces at least one shared fingerprint VALUE."""
    shared = [f"common{j}" for j in range(W + K - 1)]  # 6 tokens
    a = " ".join(_tokens(0, 20, "a") + shared + _tokens(1, 20, "a"))
    b = " ".join(_tokens(0, 17, "b") + shared + _tokens(1, 23, "b"))
    out = winnow_fingerprints(_docs(spark, [a, b]), k=K, w=W)
    fps = {r.doc_id: set() for r in out.collect()}
    for r in out.collect():
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1], "shared w+k-1 run must share a fingerprint"


def test_winnow_disjoint_docs_share_nothing(spark):
    a = " ".join(_tokens(0, 40, "p"))
    b = " ".join(_tokens(0, 40, "q"))
    out = winnow_fingerprints(_docs(spark, [a, b])).collect()
    fa = {r.fp for r in out if r.doc_id == 0}
    fb = {r.fp for r in out if r.doc_id == 1}
    assert fa and fb and not (fa & fb)


def test_winnow_short_doc_edges(spark):
    rows = ["", "one", "one two", "one two three", "a b c d"]
    out = winnow_fingerprints(_docs(spark, rows)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.fp))
    assert 0 not in by_doc and 1 not in by_doc and 2 not in by_doc
    # 3 tokens -> one shingle -> one window -> fingerprint at pos 1
    assert [p for p, _ in by_doc[3]] == [1]
    # 4 tokens -> 2 shingles < w -> ONE window over both -> one selection
    assert len(by_doc[4]) == 1 and by_doc[4][0][0] in (1, 2)


def test_winnow_density_and_dedup(spark):
    toks = _tokens(0, 200, "d")
    out = winnow_fingerprints(_docs(spark, [" ".join(toks)])).collect()
    m = len(toks) - K + 1
    # expected density 2/(w+1) = 0.4; allow a wide deterministic band
    assert 0.2 * m <= len(out) <= 0.7 * m
    assert len(out) == len({(r.pos, r.fp) for r in out})


def test_winnow_plan_is_shuffle_free_codegen(spark):
    df = winnow_fingerprints(_docs(spark, ["a b c d e f g"] * 10))
    stats = plan_stats(df)
    assert stats["exchanges"] == 0, formatted_plan(df)
    assert stats["python_stages"] == 0, formatted_plan(df)


def _skewed_corpus(spark):
    rows = []
    for i in range(60):
        body = ["hot"] * (10 + i % 7) + [f"rare{i}x{j}" for j in range(8)]
        rows.append(" ".join(body))
    return _docs(spark, rows)


def test_cms_never_underestimates(spark):
    docs = _skewed_corpus(spark)
    exact = token_counts(docs)
    cells = cms_build(docs, depth=4, width=256)
    est = cms_estimate(exact.select("token"), cells, depth=4, width=256)
    j = exact.join(est, "token").collect()
    assert len(j) == exact.count()
    assert all(r.n_cms >= r.n for r in j)
    n_total = sum(r.n for r in j)
    # point-query error <= e/width * N on this fixed corpus (w.h.p. bound,
    # deterministic here because data + salts are pinned)
    assert all(r.n_cms - r.n <= max(1, (3 * n_total) // 256) for r in j)


def test_cms_is_mergeable_cellwise(spark):
    docs = _skewed_corpus(spark)
    a = docs.where("doc_id % 2 = 0")
    b = docs.where("doc_id % 2 = 1")
    whole = {(r.r, r.c): r.n
             for r in cms_build(docs, depth=4, width=256).collect()}
    merged: dict = {}
    for part in (a, b):
        for r in cms_build(part, depth=4, width=256).collect():
            merged[(r.r, r.c)] = merged.get((r.r, r.c), 0) + r.n
    assert whole == merged


def test_cms_build_output_is_bounded(spark):
    cells = cms_build(_skewed_corpus(spark), depth=4, width=64)
    assert cells.count() <= 4 * 64
    rng = cells.agg(F.min("c"), F.max("c"), F.min("r"), F.max("r")).first()
    assert rng[0] >= 0 and rng[1] < 64 and rng[2] >= 0 and rng[3] < 4


def test_heavy_hitters_top_token_and_estimate(spark):
    out = heavy_hitters(_skewed_corpus(spark), k=5, width=256).collect()
    top = max(out, key=lambda r: r.n)
    assert top.token == "hot"
    assert all(r.n_cms >= r.n for r in out)


def test_group_sample_k_exact_and_consistent(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(200)], "doc_id long, source string")
    s5 = sample_k_per_group(df, "source", 5)
    got = s5.groupBy("source").count().collect()
    assert sorted((r.source, r["count"]) for r in got) == [
        (f"g{i}", 5) for i in range(4)]
    # subset consistency: the k=3 sample is a prefix of the k=5 sample
    ids5 = {(r.source, r.doc_id, r.rk) for r in s5.collect()}
    ids3 = {(r.source, r.doc_id, r.rk)
            for r in sample_k_per_group(df, "source", 3).collect()}
    assert ids3 < ids5
    # stable under repartition
    ids5b = {(r.source, r.doc_id, r.rk)
             for r in sample_k_per_group(df.repartition(7), "source", 5)
             .collect()}
    assert ids5b == ids5


def test_group_sample_k_plan_has_window_group_limit(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(50)], "doc_id long, source string")
    plan = formatted_plan(sample_k_per_group(df, "source", 5))
    assert "WindowGroupLimit" in plan, plan
