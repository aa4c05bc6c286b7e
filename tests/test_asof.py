"""Backward as-of join: differential vs pandas.merge_asof, tie/tolerance
semantics, and the single-shuffle plan gate."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cld2_spark.operators.asof import asof_join_backward
from cld2_spark.plans.inspect import plan_stats


def _random_frames(seed=7, n_left=400, n_right=150, n_keys=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_left),
        "k": rng.integers(0, n_keys, n_left),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n_left), unit="s"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "rts": pd.to_datetime(rng.integers(0, 10**6, n_right), unit="s"),
        "val": np.round(rng.uniform(0, 100, n_right), 2),
    })
    # force exact-tie probes: some left timestamps equal a right timestamp
    # of the same key (backward as-of is inclusive -- the tie must match)
    for i in range(10):
        left.loc[i, "k"] = right.loc[i, "k"]
        left.loc[i, "ts"] = right.loc[i, "rts"]
    return left, right


def _expected(left, right, tolerance=None):
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    return (pd.merge_asof(
        left.sort_values(["ts", "lid"]), right.sort_values("rts"),
        left_on="ts", right_on="rts", by="k", direction="backward", **kw)
        .sort_values("lid").reset_index(drop=True))


def test_asof_matches_pandas_merge_asof(spark):
    left, right = _random_frames()
    # drop right-side (k, rts) dupes: pandas keeps the last input row while
    # the operator resolves ties by max value col -- dedupe to compare
    right = right.drop_duplicates(["k", "rts"], keep="last")
    got = (asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        ["k"], "ts", "rts", ["val"])
        .toPandas().sort_values("lid").reset_index(drop=True))
    exp = _expected(left, right)
    assert got["lid"].tolist() == exp["lid"].tolist()
    pd.testing.assert_series_equal(
        got["val_asof"], exp["val"], check_names=False)
    pd.testing.assert_series_equal(
        got["ts_asof"], exp["rts"], check_names=False)


def test_asof_tie_resolves_to_max_value(spark):
    left = pd.DataFrame({"lid": [0], "k": [1],
                         "ts": pd.to_datetime(["2024-01-01 00:00:10"])})
    right = pd.DataFrame({
        "k": [1, 1],
        "rts": pd.to_datetime(["2024-01-01 00:00:05"] * 2),
        "val": [3.0, 9.0]})
    got = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        ["k"], "ts", "rts", ["val"]).toPandas()
    assert got["val_asof"].tolist() == [9.0]


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _random_frames(seed=11)
    right = right.drop_duplicates(["k", "rts"], keep="last")
    tol = pd.Timedelta(seconds=50_000)
    got = (asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        ["k"], "ts", "rts", ["val"], tolerance_sec=50_000.0)
        .toPandas().sort_values("lid").reset_index(drop=True))
    exp = _expected(left, right, tolerance=tol)
    assert exp["val"].notna().sum() > 0  # tolerance case is non-vacuous
    pd.testing.assert_series_equal(
        got["val_asof"], exp["val"], check_names=False)


def test_asof_single_exchange(spark):
    left, right = _random_frames()
    df = asof_join_backward(
        spark.createDataFrame(left), spark.createDataFrame(right),
        ["k"], "ts", "rts", ["val"])
    stats = plan_stats(df)
    assert stats["exchanges"] == 1
    assert stats["python_stages"] == 0


def test_event_asof_driver_query(spark):
    import __spark_entry__ as E

    out = E.queries()["event_asof"](spark, "/root/testdata/sf0.001").toPandas()
    assert len(out) > 0
    assert (out["purchase_age_sec"] >= 0).sum() > 0  # real matches exist
    # no-match rows coalesce, never null
    assert out["purchase_value"].notna().all()
    matched = out[out["purchase_age_sec"] >= 0]
    assert (matched["purchase_age_sec"] >= 0).all()
