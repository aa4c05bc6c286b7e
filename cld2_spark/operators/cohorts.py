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
