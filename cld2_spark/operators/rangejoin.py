"""Point-in-interval range join as a bucketed equi-join.

Spark compiles `a.ts BETWEEN r.start AND r.end` joins to
BroadcastNestedLoopJoin/Cartesian — O(|A|*|R|) and a non-starter at
scale. The standard distributed formulation (used by every interval-join
engine: Flink interval joins, Sedona/range-join libraries) buckets the
time axis: each interval explodes to the buckets it overlaps, each point
maps to exactly one bucket, and the join becomes an equi-join on
(key, bucket) plus a residual interval predicate.

With `bucket_sec` >= the maximum interval length, an interval spans at
most 2 buckets, so the fan-out is bounded by 2x and each (point,
interval) pair meets in EXACTLY one bucket — no post-join dedup needed.
One shuffle on (key, bucket), codegen residual filter, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _epoch(col):
    # cast("timestamp") relabels TIMESTAMP_NTZ parquet columns; the
    # session tz is pinned UTC (session.py) so the relabel is exact
    return F.unix_micros(F.col(col).cast("timestamp"))


def range_join_points(points: DataFrame, intervals: DataFrame,
                      on: list[str], point_ts: str, start_ts: str,
                      end_sec: float, bucket_sec: float | None = None,
                      ) -> DataFrame:
    """Inner-join each `points` row to every `intervals` row with the
    same `on` key and `start_ts <= point_ts < start_ts + end_sec`
    (half-open, fixed-length intervals). Returns all columns of both
    sides except the interval's key columns (already present).

    `bucket_sec` defaults to `end_sec` — the largest bucket that still
    bounds the interval fan-out at 2 rows; larger buckets trade fewer
    exploded rows for more residual-filter misses.
    """
    if bucket_sec is None:
        bucket_sec = end_sec
    if bucket_sec < end_sec:
        raise ValueError("bucket_sec must be >= end_sec: an interval "
                         "must span at most 2 buckets")
    b_us = int(bucket_sec * 1_000_000)
    e_us = int(end_sec * 1_000_000)

    p = points.withColumn("__rj_bucket",
                          F.floor(_epoch(point_ts) / F.lit(b_us)))
    # explode each interval to its (at most 2) overlapping buckets
    i = (intervals
         .withColumn("__rj_b0", F.floor(_epoch(start_ts) / F.lit(b_us)))
         .withColumn("__rj_b1",
                     F.floor((_epoch(start_ts) + F.lit(e_us - 1))
                             / F.lit(b_us)))
         .withColumn("__rj_bucket",
                     F.explode(F.array_distinct(
                         F.array(F.col("__rj_b0"), F.col("__rj_b1")))))
         .drop("__rj_b0", "__rj_b1"))
    joined = p.join(i, on=on + ["__rj_bucket"], how="inner").where(
        (_epoch(point_ts) >= _epoch(start_ts))
        & (_epoch(point_ts) < _epoch(start_ts) + F.lit(e_us)))
    return joined.drop("__rj_bucket")
