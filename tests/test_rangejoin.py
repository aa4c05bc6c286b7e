"""Bucketed range join: brute-force differential, boundary semantics,
and the no-nested-loop plan gate."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cld2_spark.operators.rangejoin import range_join_points
from cld2_spark.plans.inspect import formatted_plan, plan_stats


def _frames(seed=3, n_pts=300, n_iv=120, n_keys=8):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame({
        "pid": np.arange(n_pts),
        "k": rng.integers(0, n_keys, n_pts),
        "ts": pd.to_datetime(rng.integers(0, 10**5, n_pts), unit="s"),
    })
    iv = pd.DataFrame({
        "iid": np.arange(n_iv),
        "k": rng.integers(0, n_keys, n_iv),
        "start": pd.to_datetime(rng.integers(0, 10**5, n_iv), unit="s"),
    })
    return pts, iv


def _brute(pts, iv, end_sec):
    m = pts.merge(iv, on="k")
    d = (m["ts"] - m["start"]).dt.total_seconds()
    return m[(d >= 0) & (d < end_sec)][["pid", "iid"]]


def _pairs(df):
    return sorted(map(tuple, df[["pid", "iid"]].to_numpy().tolist()))


def test_range_join_matches_brute_force(spark):
    pts, iv = _frames()
    end_sec = 900.0
    got = range_join_points(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        ["k"], "ts", "start", end_sec).toPandas()
    assert _pairs(got) == _pairs(_brute(pts, iv, end_sec))
    # also with a bucket larger than the interval
    got2 = range_join_points(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        ["k"], "ts", "start", end_sec, bucket_sec=3600.0).toPandas()
    assert _pairs(got2) == _pairs(got)


def test_range_join_half_open_boundaries(spark):
    pts = pd.DataFrame({
        "pid": [0, 1, 2],
        "k": [1, 1, 1],
        # exactly at start (in), just before end (in), exactly at end (out)
        "ts": pd.to_datetime([100, 199, 200], unit="s")})
    iv = pd.DataFrame({"iid": [0], "k": [1],
                       "start": pd.to_datetime([100], unit="s")})
    got = range_join_points(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        ["k"], "ts", "start", 100.0).toPandas()
    assert sorted(got["pid"].tolist()) == [0, 1]


def test_range_join_no_nested_loop(spark):
    pts, iv = _frames()
    df = range_join_points(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        ["k"], "ts", "start", 900.0)
    plan = formatted_plan(df)
    assert "NestedLoop" not in plan
    assert "Cartesian" not in plan
    assert plan_stats(df)["python_stages"] == 0


def test_error_attribution_driver_query(spark):
    import __spark_entry__ as E

    out = E.queries()["error_attribution"](
        spark, "/root/testdata/sf0.001").toPandas()
    assert (out["lag_sec"] >= 0).all()
    assert (out["lag_sec"] < 7200).all()
    # pairs are unique: each (click, error) meets in exactly one bucket
    assert not out.duplicated(["click_id", "error_id"]).any()
