"""Cohort retention over an event stream.

Users are cohorted by the epoch-week of their first event; retention is
the count of distinct active users per (cohort_week, week_offset). The
classic product-analytics rollup, expressed with engine-exact integer
week arithmetic (epoch-microsecond integer division, no timezone or
calendar functions) so a DuckDB oracle reproduces it bit-for-bit.

Scale shape at 10^12 events: two shuffles total. The first-event table
is one groupBy keyed by user (map-side combinable MIN); the cohort join
is user-keyed against a table with exactly one row per user — Spark's
AQE will broadcast it when the user universe fits, and hash-join
otherwise; the final rollup keys on (cohort_week, week_offset), a tiny
domain, with COUNT(DISTINCT user) rewritten by Catalyst into a two-level
partial aggregate (expand + partial + final), so no single reducer ever
sees all users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WEEK_US = 7 * 24 * 3600 * 1_000_000


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """(cohort_week, week_offset, active_users) — distinct users from
    each first-event-week cohort active in each subsequent week. Weeks
    are floor(epoch_us / WEEK_US): integer, calendar-free, identical
    across engines (all timestamps post-1970, so truncating and flooring
    division agree)."""
    wk = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {WEEK_US}")
    first = (events.groupBy(user_col)
             .agg(F.min(wk).alias("cohort_week")))
    ev = events.select(user_col, wk.alias("event_week"))
    return (ev.join(first, user_col)
            .groupBy("cohort_week",
                     (F.col("event_week") - F.col("cohort_week"))
                     .cast("bigint").alias("week_offset"))
            .agg(F.countDistinct(user_col).alias("active_users")))


def retention_cohorts_duck_sql(table: str = "events",
                               user_col: str = "user_id",
                               ts_col: str = "ts") -> str:
    """DuckDB replay (// floors like DIV truncates for positive us)."""
    wk = f"epoch_us({ts_col}) // {WEEK_US}"
    return (
        f"WITH rc_first AS (SELECT {user_col}, MIN({wk}) AS cohort_week "
        f"FROM {table} GROUP BY {user_col}), "
        f"rc_ev AS (SELECT {user_col}, {wk} AS event_week FROM {table}) "
        f"SELECT cohort_week, "
        f"CAST(event_week - cohort_week AS BIGINT) AS week_offset, "
        f"COUNT(DISTINCT rc_ev.{user_col}) AS active_users "
        f"FROM rc_ev JOIN rc_first USING ({user_col}) "
        f"GROUP BY cohort_week, week_offset")


def daily_anomalies(events: DataFrame, type_col: str = "event_type",
                    ts_col: str = "ts") -> DataFrame:
    """Per-(event_type, day) volume anomaly flags: a day is anomalous for
    a type when its event count deviates from the type's mean daily count
    by more than 2 population standard deviations.

    The 2-sigma rule is evaluated ENTIRELY in integers: with S1 = sum of
    daily counts, S2 = sum of squared daily counts, D = #days,

        |n - S1/D| > 2*sqrt(S2/D - (S1/D)^2)
        <=>  (n*D - S1)^2 > 4*(S2*D - S1^2)

    so there is no float boundary for engines to disagree on (the
    standard integer cross-multiplication trick used across this repo
    for rankings). Magnitude bound: safe in int64 while n*D < ~3*10^9;
    at planetary scale switch the comparison operands to DOUBLE -- the
    flag then tolerates last-ulp ties, or keep DECIMAL(38).

    Scale shape: one map-side-combinable count keyed by (type, day), one
    tiny per-type rollup (cardinality = #types), broadcast back. No
    window functions, no sort.
    """
    day_us = 24 * 3600 * 1_000_000
    day = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {day_us}")
    daily = (events.groupBy(F.col(type_col).alias("event_type"),
                            day.alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events")))
    stats = (daily.groupBy("event_type")
             .agg(F.sum("n_events").alias("s1"),
                  F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
                  F.count(F.lit(1)).alias("d")))
    j = daily.join(F.broadcast(stats), "event_type")
    lhs = (F.col("n_events") * F.col("d") - F.col("s1"))
    rhs = F.lit(4) * (F.col("s2") * F.col("d") - F.col("s1") * F.col("s1"))
    return (j.select("event_type", "day", "n_events",
                     (lhs * lhs > rhs).alias("is_anomaly")))


def daily_anomalies_duck_sql(table: str = "events",
                             type_col: str = "event_type",
                             ts_col: str = "ts") -> str:
    """DuckDB replay of daily_anomalies (same integer algebra)."""
    day_us = 24 * 3600 * 1_000_000
    return (
        f"WITH da_d AS (SELECT {type_col} AS event_type, "
        f"  epoch_us({ts_col}) // {day_us} AS day, "
        f"  COUNT(*) AS n_events FROM {table} GROUP BY 1, 2), "
        f"da_s AS (SELECT event_type, "
        f"  CAST(SUM(n_events) AS BIGINT) AS s1, "
        f"  CAST(SUM(n_events * n_events) AS BIGINT) AS s2, "
        f"  COUNT(*) AS d FROM da_d GROUP BY event_type) "
        f"SELECT da_d.event_type, day, n_events, "
        f"(n_events * d - s1) * (n_events * d - s1) > "
        f"4 * (s2 * d - s1 * s1) AS is_anomaly "
        f"FROM da_d JOIN da_s ON da_d.event_type = da_s.event_type")


def reach(events: DataFrame, type_col: str = "event_type",
          user_col: str = "user_id", approx: bool = False,
          rsd: float = 0.02) -> DataFrame:
    """(event_type, reach, n_events): distinct users + event volume per
    type. exact=COUNT(DISTINCT) is the oracle surface; approx=True swaps
    in approx_count_distinct (HyperLogLog++) -- the 100TB path: HLL
    sketches are fixed-size and merge associatively, so the partial
    aggregate ships ~1.5KB per (type, partition) instead of re-shuffling
    every distinct user id. The exact form's expand+two-level rewrite is
    fine while distinct users per type fit a shuffle; the sketch is the
    default once user cardinality crosses ~10^9 (error ~ rsd)."""
    agg = (F.approx_count_distinct(user_col, rsd) if approx
           else F.countDistinct(user_col))
    return (events.groupBy(F.col(type_col).alias("event_type"))
            .agg(agg.alias("reach"),
                 F.count(F.lit(1)).alias("n_events")))
