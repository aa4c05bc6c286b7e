"""Distributed prefix sum, CCNet bucketing, and DSIR selection."""

from pyspark.sql import functions as F

from cld2_spark.operators.dsir import (N_BUCKETS, _model_counts,
                                       dsir_select)
from cld2_spark.operators.ngram_lm import ccnet_buckets
from cld2_spark.operators.prefix import running_total


def test_running_total_matches_serial_scan(spark):
    rows = [(i, (i * 37) % 101 - 50) for i in range(500)]  # negatives too
    df = spark.createDataFrame(rows, "k long, v long")
    got = {r.k: r.cum
           for r in running_total(df, ["k"], "v", num_partitions=7)
           .collect()}
    acc, want = 0, {}
    for k, v in rows:
        acc += v
        want[k] = acc
    assert got == want


def test_running_total_stable_under_input_partitioning(spark):
    rows = [(i, i % 13) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = {r.k: r.cum for r in running_total(df, ["k"], "v").collect()}
    b = {r.k: r.cum
         for r in running_total(df.repartition(11), ["k"], "v",
                                num_partitions=3).collect()}
    assert a == b


def test_running_total_no_global_single_partition_window(spark):
    """The data-sized window must be keyed by the scan partition id —
    only the tiny offsets table may use an unpartitioned window."""
    df = spark.range(1000).select(F.col("id").alias("k"),
                                  F.lit(1).cast("long").alias("v"))
    plan = (running_total(df, ["k"], "v", num_partitions=8)
            ._jdf.queryExecution().executedPlan().toString())
    # the range exchange for the global ordering is present...
    assert "rangepartitioning" in plan.lower()
    # ...and every Window over the data carries the partition-id key
    for line in plan.splitlines():
        if "Window [" in line and "__scan_pid" not in line:
            # the offsets window runs over the <=n-row totals table;
            # it is the only allowed partnerless window and its frame
            # ends at -1 (exclusive prefix)
            assert "rowsbetween" in line.lower() or "-1" in line, line


def test_ccnet_buckets_thirds_by_characters(spark):
    # 90 docs, identical length -> bucket boundaries are exact thirds
    docs = spark.createDataFrame(
        [(i, f"w{i} " * 10 + "the end of doc", 30) for i in range(90)],
        "doc_id long, text string, n_chars long")
    out = ccnet_buckets(docs, min_count=1).collect()
    sizes = {}
    for r in out:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + r.n_chars
    tot = sum(sizes.values())
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 2 * 30
    # ordering property: every head doc scores >= every tail doc
    head_min = min(r.avg_score_ppm for r in out if r.bucket == "head")
    tail_max = max(r.avg_score_ppm for r in out if r.bucket == "tail")
    assert head_min >= tail_max
    assert tot == sum(r.n_chars for r in out)


def test_ccnet_buckets_skips_unscorable_docs(spark):
    docs = spark.createDataFrame(
        [(0, "solo", 4), (1, "", 0), (2, "two tokens here ok", 18),
         (3, "more fluent tokens here ok", 26)],
        "doc_id long, text string, n_chars long")
    got = {r.doc_id for r in ccnet_buckets(docs, min_count=1).collect()}
    assert got == {2, 3}


def _dsir_corpus(spark):
    rows = []
    for i in range(120):
        if i % 3 == 0:   # science-flavored docs
            body = f"atoms orbit the nucleus and electrons bind s{i}"
        else:            # chatter
            body = f"lol random chatter about nothing much at all c{i}"
        rows.append((i, body, "sci" if i % 3 == 0 else "web"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_selects_target_flavored_docs(spark):
    docs = _dsir_corpus(spark)
    target = docs.where("source = 'sci' AND doc_id < 30")  # 10 docs
    out = dsir_select(docs, target, k=30).collect()
    srcs = [r.doc_id % 3 == 0 for r in out]
    assert sum(srcs) >= 27, "selection must skew hard toward target flavor"
    assert all(out[i].avg_wppm >= out[i + 1].avg_wppm
               for i in range(len(out) - 1))


def test_dsir_model_is_bounded_by_bucket_space(spark):
    docs = _dsir_corpus(spark)
    m = _model_counts(docs, "text", "doc_id", 64, "cq")
    assert m.count() <= 64
    rng = m.agg(F.min("b"), F.max("b")).first()
    assert rng[0] >= 0 and rng[1] < 64
    assert N_BUCKETS == 4096
