"""Skew hardening for the join operators (VERDICT r4 item #5): a mega-key
(one user with 10^5 events) must neither break correctness nor pin one
task. The as-of join's time-salted variant (bucket_sec) and the range
join's native (key, bucket) shuffle key both spread a hot key across
time buckets; these tests pin the differential equivalence and the
per-group row bound that caps task skew."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cld2_spark.operators.asof import asof_join_backward
from cld2_spark.operators.rangejoin import range_join_points

BASE = pd.Timestamp("2025-01-01")


def _mega_events(n_left: int, n_right: int, seed: int = 7,
                 n_cold: int = 500) -> tuple[pd.DataFrame, pd.DataFrame]:
    """One mega user holding ~all rows + a few cold users, spread over
    ~12 days so time bucketing has room to spread the hot key."""
    rng = np.random.default_rng(seed)
    span_s = 1_000_000
    left = pd.DataFrame({
        "event_id": np.arange(n_left, dtype=np.int64),
        "user_id": np.where(np.arange(n_left) % (n_left // max(n_cold, 1) + 1)
                            == 0, "cold", "mega"),
        "ts": BASE + pd.to_timedelta(
            np.sort(rng.integers(0, span_s * 1_000_000, n_left)), unit="us"),
        "value": rng.normal(size=n_left).round(3),
    })
    right = pd.DataFrame({
        "user_id": np.where(np.arange(n_right) % 97 == 0, "cold", "mega"),
        "ts": BASE + pd.to_timedelta(
            np.sort(rng.integers(0, span_s * 1_000_000, n_right)), unit="us"),
        "value": rng.normal(size=n_right).round(3),
    })
    return left, right


def _run_asof(spark, left, right, **kw):
    out = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["value"],
        **kw)
    return (out.select("event_id", "user_id", "value", "ts_asof",
                       "value_asof")
            .toPandas().sort_values("event_id").reset_index(drop=True))


def test_salted_asof_equals_unsalted_mega_key(spark):
    left, right = _mega_events(100_000, 20_000)
    plain = _run_asof(spark, left, right)
    salted = _run_asof(spark, left, right, bucket_sec=50_000.0)
    pd.testing.assert_frame_equal(plain, salted)
    # sanity: the join actually matched most rows
    assert salted["value_asof"].notna().mean() > 0.95


def test_salted_asof_tolerance_and_no_match(spark):
    left, right = _mega_events(20_000, 3_000, seed=11)
    plain = _run_asof(spark, left, right, tolerance_sec=40_000.0)
    salted = _run_asof(spark, left, right, tolerance_sec=40_000.0,
                       bucket_sec=30_000.0)
    pd.testing.assert_frame_equal(plain, salted)
    assert salted["value_asof"].isna().any()  # tolerance really nulls


def test_salted_asof_bounds_group_size(spark):
    """The window's partition unit under salting is (key, bucket): for a
    10^5-row mega key the largest group must be a small fraction of the
    key's rows — the property that caps any single task."""
    left, right = _mega_events(100_000, 20_000)
    bucket_sec = 50_000.0
    both = pd.concat([left[["user_id", "ts"]], right[["user_id", "ts"]]])
    bkt = (both["ts"].astype("int64") // int(bucket_sec * 1_000_000))
    sizes = both.assign(b=bkt).groupby(["user_id", "b"]).size()
    mega_total = (both["user_id"] == "mega").sum()
    assert sizes.max() < mega_total / 10, (
        f"largest (key,bucket) group {sizes.max()} vs {mega_total} total")
    # and >= 15 buckets actually carry the mega key's rows
    assert sizes.loc["mega"].shape[0] >= 15


def test_range_join_mega_key_matches_bruteforce_and_spreads(spark):
    """range_join_points already shuffles on (key, bucket): a mega key's
    points spread across time buckets by construction. Differential vs a
    DuckDB inequality join + group-size bound."""
    rng = np.random.default_rng(5)
    n_pts, n_iv, span_s = 100_000, 300, 600_000
    pts = pd.DataFrame({
        "point_id": np.arange(n_pts, dtype=np.int64),
        "key": np.where(np.arange(n_pts) % 101 == 0, "cold", "mega"),
        "ts": BASE + pd.to_timedelta(
            rng.integers(0, span_s * 1_000_000, n_pts), unit="us"),
    })
    iv = pd.DataFrame({
        "iv_id": np.arange(n_iv, dtype=np.int64),
        "key": np.where(np.arange(n_iv) % 13 == 0, "cold", "mega"),
        "start": BASE + pd.to_timedelta(
            rng.integers(0, span_s * 1_000_000, n_iv), unit="us"),
    })
    end_sec = 2_000.0
    got = (range_join_points(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        on=["key"], point_ts="ts", start_ts="start", end_sec=end_sec)
        .select("point_id", "iv_id").toPandas()
        .sort_values(["point_id", "iv_id"]).reset_index(drop=True))
    want = duckdb.sql(f"""
        SELECT p.point_id, i.iv_id FROM pts p JOIN iv i
        ON p.key = i.key AND p.ts >= i.start
        AND epoch_us(p.ts) < epoch_us(i.start) + {int(end_sec * 1e6)}
        ORDER BY point_id, iv_id""").df()
    assert len(got) == len(want) > 10_000
    assert (got["point_id"].to_numpy() == want["point_id"].to_numpy()).all()
    assert (got["iv_id"].to_numpy() == want["iv_id"].to_numpy()).all()
    # group-size bound: mega key's points spread over many buckets
    bkt = pts["ts"].astype("int64") // int(end_sec * 1_000_000)
    sizes = pts.assign(b=bkt).groupby(["key", "b"]).size()
    assert sizes.max() < (pts["key"] == "mega").sum() / 50


def test_funnel_mega_user_skew(spark):
    """One user with 10^5 events (vs 1000 normal users) must not change
    funnel semantics and must flow through partial aggregation -- the
    operator is agg-only, so the hot key reduces map-side and reaches
    the exchange as ONE row per (user, step) regardless of event count."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cld2_spark.operators.funnel import funnel_steps

    t0 = dt.datetime(2024, 1, 1)
    mega = (spark.range(100_000)
            .select(F.lit(0).alias("user_id"),
                    F.when(F.col("id") % 3 == 0, "a")
                     .when(F.col("id") % 3 == 1, "b")
                     .otherwise("c").alias("event_type"),
                    (F.lit(t0) + F.make_interval(secs=F.col("id")))
                    .alias("ts")))
    normal = (spark.range(1, 1001)
              .select(F.col("id").alias("user_id"), F.lit("a").alias("event_type"),
                      F.lit(t0).alias("ts")))
    out = funnel_steps(mega.unionByName(normal), ["a", "b", "c"]).toPandas()
    # only the mega user completes a->b->c; earliest chain is ids 0,1,2
    assert out.user_id.tolist() == [0]
    r = out.iloc[0]
    assert (r.t2 - r.t1, r.t3 - r.t1) == (1_000_000, 2_000_000)
