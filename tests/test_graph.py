"""TextRank co-occurrence PageRank, PMI collocations, k-anon release."""

from pyspark.sql import functions as F

from cld2_spark.operators.curation import kanon_grams
from cld2_spark.operators.graph import (BASE_PPM, DAMP_DEN, DAMP_NUM,
                                        R0_PPM, cooccurrence_edges,
                                        textrank_keywords)
from cld2_spark.operators.ngram_lm import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _simulate_textrank(texts, min_len, min_count, iters):
    """Independent per-edge integer PageRank simulator."""
    from collections import Counter, defaultdict
    pairs = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if len(w) >= min_len]
        for a, b in zip(toks, toks[1:]):
            if a != b:
                pairs[(min(a, b), max(a, b))] += 1
    edges = defaultdict(list)   # dst -> [(src, w)]
    wdeg = Counter()
    for (u, v), w in pairs.items():
        if w < min_count:
            continue
        edges[v].append((u, w))
        edges[u].append((v, w))
        wdeg[u] += w
        wdeg[v] += w
    r = {n: R0_PPM for n in wdeg}
    for _ in range(iters):
        r = {v: BASE_PPM
             + (DAMP_NUM * sum((r[u] * w) // wdeg[u] for u, w in ins))
             // DAMP_DEN
             for v, ins in edges.items()}
    return r, wdeg


def test_textrank_matches_integer_simulator(spark):
    texts = ["alpha bravo charlie alpha bravo",
             "bravo charlie delta echo delta",
             "alpha charlie alpha bravo echo",
             "delta echo delta charlie bravo",
             "echo alpha bravo bravo charlie"]
    got = {r.word: (r.rank_ppm, r.wdeg)
           for r in textrank_keywords(_docs(spark, texts), k=100,
                                      min_len=4, min_count=2,
                                      iters=4).collect()}
    want_r, want_d = _simulate_textrank(texts, 4, 2, 4)
    assert got == {n: (want_r[n], want_d[n]) for n in want_r}


def test_textrank_hub_outranks_leaf(spark):
    # 'center' is adjacent to every other word; leaves only touch center
    texts = [f"center leaf{i:02d} center leaf{i:02d}" for i in range(6)] * 2
    rows = textrank_keywords(_docs(spark, texts), k=10, min_len=4,
                             min_count=2, iters=5).collect()
    assert rows[0].word == "center"
    assert all(rows[0].rank_ppm > r.rank_ppm for r in rows[1:])


def test_cooccurrence_edges_prunes_and_symmetrizes(spark):
    texts = ["aaaa bbbb aaaa bbbb", "aaaa bbbb cccc dddd"]
    e = {(r.src, r.dst): (r.w, r.wdeg)
         for r in cooccurrence_edges(_docs(spark, texts),
                                     min_len=4, min_count=2).collect()}
    # only (aaaa,bbbb) survives min_count=2 (weight 4: 3 adjacencies +1)
    assert set(e) == {("aaaa", "bbbb"), ("bbbb", "aaaa")}
    assert e[("aaaa", "bbbb")] == (4, 4) and e[("bbbb", "aaaa")] == (4, 4)


def test_kanon_release_threshold_is_distinct_docs(spark):
    secret = "secret token xyzzy"
    common = "the quick brown fox"
    # secret trigram in 2 docs (one doc repeats it -> still 1 doc),
    # common trigram in 4 docs
    texts = [f"{secret} {secret}", secret, common, common, common, common]
    rel3 = {r.gram: r.n_docs
            for r in kanon_grams(_docs(spark, texts), n=3,
                                 k_anon=3).collect()}
    assert "the quick brown" in rel3 and rel3["the quick brown"] == 4
    assert all("xyzzy" not in g for g in rel3)
    rel2 = {r.gram: r.n_docs
            for r in kanon_grams(_docs(spark, texts), n=3,
                                 k_anon=2).collect()}
    assert rel2["secret token xyzzy"] == 2  # repeats inside a doc: 1 vote


def test_pmi_top_pair_is_the_exclusive_collocation(spark):
    # 'hong kong' only ever co-occur; filler words are promiscuous
    texts = (["hong kong"] * 6
             + ["new york city", "new york state", "york new deal",
                "city state deal new york"] * 3)
    rows = pmi_collocations(_docs(spark, texts), k=5,
                            min_count=3).collect()
    assert (rows[0].h, rows[0].w) == ("hong", "kong")
    assert rows[0].pmi_ratio_ppm > rows[1].pmi_ratio_ppm


def test_textrank_total_rank_mass_bounded(spark):
    texts = ["node%d node%d" % (i, (i + 1) % 8) for i in range(8)] * 3
    df = textrank_keywords(_docs(spark, texts), k=100, min_len=4,
                           min_count=2, iters=5)
    rows = df.collect()
    n = len(rows)
    total = sum(r.rank_ppm for r in rows)
    # damped PageRank conserves mass within floor-division slack
    assert n > 0 and abs(total - n * R0_PPM) <= n * 1000
