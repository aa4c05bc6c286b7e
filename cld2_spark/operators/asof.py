"""Backward as-of join as a single-shuffle DataFrame composition.

Spark has no ASOF JOIN operator (DuckDB/kdb/pandas do); the standard
distributed formulation is the union+window trick: tag both sides, union
them, and run one `last(..., ignorenulls=True)` window per carried column
over (key) ordered by (ts, side, tiebreak). Right-side rows sort BEFORE
left-side rows at equal timestamps, so a probe row sees every right row
with `r.ts <= l.ts` — exactly backward-as-of semantics with inclusive
ties, matching `pandas.merge_asof(direction="backward")`.

Scale shape: ONE exchange (hash partition on the key) followed by an
in-partition sort — the same plan a sort-merge join would need, minus the
join explosion. No broadcast, no Python, works at any right-side
cardinality. Skew on a hot key is bounded by that key's window sort; at
10^12 rows the key should be salted upstream only if a single key exceeds
a partition (not the case for per-user event streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"
_TIE = "__asof_tie"


def asof_join_backward(left: DataFrame, right: DataFrame, on: list[str],
                       left_ts: str, right_ts: str,
                       value_cols: list[str], suffix: str = "_asof",
                       tolerance_sec: float | None = None) -> DataFrame:
    """For each `left` row, attach `value_cols` (and the match timestamp,
    as `{left_ts}{suffix}`) from the latest `right` row with the same
    `on` key and `right_ts` <= `left_ts`; nulls when no such row.

    Ties among right rows at one timestamp resolve deterministically to
    the row with the greatest first value column. `tolerance_sec` nulls
    out matches older than the window (pandas `tolerance=`).
    """
    carried = [right_ts] + value_cols
    out_names = {right_ts: f"{left_ts}{suffix}"}
    out_names.update({c: f"{c}{suffix}" for c in value_cols})

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
          for c in carried],
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("double").alias(_TIE),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        *[F.col(c).alias(out_names[c]) for c in carried],
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.col(value_cols[0]).cast("double").alias(_TIE),
    ).select(*l_tagged.columns)  # align union column order

    w = (Window.partitionBy(*on)
         .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc(),
                  F.col(_TIE).asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = l_tagged.unionByName(r_tagged)
    for c in carried:
        u = u.withColumn(out_names[c],
                         F.last(out_names[c], ignorenulls=True).over(w))
    out = u.where(F.col(_SIDE) == 1).drop(_SIDE, _TIE, "__asof_ts")
    if tolerance_sec is not None:
        # materialize the predicate BEFORE nulling any carried column --
        # it reads the matched-ts column, which the loop below overwrites
        matched_ts = out_names[right_ts]
        # cast("timestamp") accepts TIMESTAMP_NTZ parquet columns; the
        # session tz is pinned UTC (session.py) so the relabel is exact
        out = out.withColumn("__asof_stale",
                             F.unix_micros(F.col(left_ts).cast("timestamp"))
                             - F.unix_micros(
                                 F.col(matched_ts).cast("timestamp"))
                             > int(tolerance_sec * 1_000_000))
        for c in carried:
            out = out.withColumn(
                out_names[c],
                F.when(F.col("__asof_stale"), F.lit(None))
                 .otherwise(F.col(out_names[c])))
        out = out.drop("__asof_stale")
    return out
