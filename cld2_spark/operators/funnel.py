"""Ordered k-step funnel over an event stream.

For each user, find the earliest strictly-increasing timestamp chain
t1 < t2 < ... < tk where ti is an event of step i — the standard product
funnel (view -> click -> purchase). Greedy-earliest is complete: if any
increasing chain exists for a user, the chain built by taking each
step's earliest qualifying event exists too (exchange argument), so
completers are exactly the users with at least one valid chain.

Spark shape at 10^12 events: one filtered partial-aggregation per step,
each keyed by the user id (k is small and fixed). No per-user event
buffering, no window over the whole stream, no sort — a user with 10^6
events costs the same map-side combine as one with 10. Later steps
shrink monotonically (only users alive after step i-1 are joined), and
the carried chain is one row per user, so every join after the first is
an ever-smaller hash join. Skewed users are harmless: aggregation is
map-side combinable and the join key (user) is unique on the carried
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_steps(df: DataFrame, steps: list[str],
                 user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """(user, t1_us, ..., tk_us, convert_sec) for users completing every
    step in order; ti are epoch microseconds (engine-exact integers)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cur = (df.where(F.col(type_col) == steps[0])
           .groupBy(user_col)
           .agg(F.min(us).alias("t1")))
    for i, step in enumerate(steps[1:], start=2):
        prev_cols = [f"t{j}" for j in range(1, i)]
        cur = (df.where(F.col(type_col) == step)
               .join(cur, on=user_col)
               .where(us > F.col(f"t{i - 1}"))
               .groupBy(user_col, *prev_cols)
               .agg(F.min(us).alias(f"t{i}")))
    k = len(steps)
    return cur.select(
        user_col, *[f"t{j}" for j in range(1, k + 1)],
        F.round((F.col(f"t{k}") - F.col("t1")) / 1_000_000.0, 3)
        .alias("convert_sec"))


def funnel_steps_duck_sql(steps: list[str], table: str = "events",
                          user_col: str = "user_id",
                          type_col: str = "event_type",
                          ts_col: str = "ts") -> str:
    """DuckDB replay of funnel_steps (epoch_us == unix_micros on the
    same UTC-naive timestamps)."""
    ctes = [(f"fn1",
             f"SELECT {user_col}, MIN(epoch_us({ts_col})) AS t1 "
             f"FROM {table} WHERE {type_col} = '{steps[0]}' "
             f"GROUP BY {user_col}")]
    for i, step in enumerate(steps[1:], start=2):
        prev = ", ".join(f"t{j}" for j in range(1, i))
        ctes.append((
            f"fn{i}",
            f"SELECT e.{user_col}, {prev}, "
            f"MIN(epoch_us(e.{ts_col})) AS t{i} "
            f"FROM {table} e JOIN fn{i - 1} p USING ({user_col}) "
            f"WHERE e.{type_col} = '{step}' "
            f"AND epoch_us(e.{ts_col}) > p.t{i - 1} "
            f"GROUP BY e.{user_col}, {prev}"))
    k = len(steps)
    body = ", ".join(f"{n} AS ({s})" for n, s in ctes)
    tcols = ", ".join(f"t{j}" for j in range(1, k + 1))
    return (f"WITH {body} SELECT {user_col}, {tcols}, "
            f"ROUND((t{k} - t1) / 1000000.0, 3) AS convert_sec "
            f"FROM fn{k}")
