"""Backward as-of join as a single-shuffle DataFrame composition.

Spark has no ASOF JOIN operator (DuckDB/kdb/pandas do); the standard
distributed formulation is the union+window trick: tag both sides, union
them, and run ONE `last(..., ignorenulls=True)` window over (key) ordered
by (ts, side, tiebreak). Right-side rows sort BEFORE left-side rows at
equal timestamps, so a probe row sees every right row with `r.ts <= l.ts`
— exactly backward-as-of semantics with inclusive ties, matching
`pandas.merge_asof(direction="backward")`.

All carried columns (the match timestamp + every value column) travel as
a SINGLE struct filled by one `last(ignorenulls=True)` pass: the struct
is non-null on every right row even when individual value columns are
null, so the result always unpacks one coherent right row — a per-column
fill would otherwise mix columns from different right rows whenever a
right value is null.

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
_PACK = "__asof_pack"


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
    pack_type = "struct<" + ",".join(
        f"`{c}`:{right.schema[c].dataType.simpleString()}"
        for c in carried) + ">"

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(pack_type).alias(_PACK),
        F.col(left_ts).alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("double").alias(_TIE),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        # one struct per right row: non-null even when a value column is
        # null, so last(ignorenulls) always carries a COHERENT right row
        F.struct(*[F.col(c) for c in carried]).alias(_PACK),
        F.col(right_ts).alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        F.col(value_cols[0]).cast("double").alias(_TIE),
    ).select(*l_tagged.columns)  # align union column order

    w = (Window.partitionBy(*on)
         .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc(),
                  F.col(_TIE).asc_nulls_last())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (l_tagged.unionByName(r_tagged)
         .withColumn(_PACK, F.last(_PACK, ignorenulls=True).over(w)))
    out = u.where(F.col(_SIDE) == 1).drop(_SIDE, _TIE, "__asof_ts")
    if tolerance_sec is not None:
        # null the WHOLE pack when the match is older than the window --
        # cast("timestamp") accepts TIMESTAMP_NTZ parquet columns; the
        # session tz is pinned UTC (session.py) so the relabel is exact
        out = out.withColumn(
            _PACK,
            F.when(F.unix_micros(F.col(left_ts).cast("timestamp"))
                   - F.unix_micros(
                       F.col(_PACK)[right_ts].cast("timestamp"))
                   > int(tolerance_sec * 1_000_000),
                   F.lit(None)).otherwise(F.col(_PACK)))
    out = out.select(
        *[F.col(c) for c in out.columns if c != _PACK],
        *[F.col(_PACK)[c].alias(out_names[c]) for c in carried])
    return out
