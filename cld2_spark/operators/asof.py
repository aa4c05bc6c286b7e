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
cardinality.

Skew: a hot key's window sort is bounded by that key's row count. When a
single key can exceed a partition (10^5+ rows on one user), pass
`bucket_sec`: the TIME-SALTED variant partitions the window by
(key, time_bucket) so a hot key's rows spread across as many tasks as it
spans buckets. Correctness across bucket boundaries is restored by
carrier rows: per (key, bucket) the best right row is pre-aggregated
(map-side combinable), a tiny per-bucket window computes the running
"latest right row as of each bucket's start", and that carrier is
injected at the head of every left bucket. All heavy shuffles stay keyed
by (key, bucket); the only key-grained window runs over per-bucket
summary rows (#buckets rows per key, not #events). AQE's skew-join
splitting does NOT apply here (window, not join), so this explicit
salting is the scale path — `tests/test_join_skew.py` pins both the
differential equivalence and the per-task row bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side"
_TIE = "__asof_tie"
_PACK = "__asof_pack"
_BKT = "__asof_bucket"
_INF = float("inf")


def _epoch_us(col):
    # cast("timestamp") relabels TIMESTAMP_NTZ parquet columns; the
    # session tz is pinned UTC (session.py) so the relabel is exact
    return F.unix_micros(F.col(col).cast("timestamp"))


def asof_join_backward(left: DataFrame, right: DataFrame, on: list[str],
                       left_ts: str, right_ts: str,
                       value_cols: list[str], suffix: str = "_asof",
                       tolerance_sec: float | None = None,
                       bucket_sec: float | None = None) -> DataFrame:
    """For each `left` row, attach `value_cols` (and the match timestamp,
    as `{left_ts}{suffix}`) from the latest `right` row with the same
    `on` key and `right_ts` <= `left_ts`; nulls when no such row.

    Ties among right rows at one timestamp resolve deterministically to
    the row with the greatest first value column (nulls greatest).
    `tolerance_sec` nulls out matches older than the window (pandas
    `tolerance=`). `bucket_sec` enables the time-salted window for hot
    keys (see module docstring); results are identical.
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
        # +inf (not null) so struct-max ordering in the salted carrier agg
        # agrees with the window's asc ordering: null value => greatest
        F.lit(_INF).alias(_TIE),
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
        F.coalesce(F.col(value_cols[0]).cast("double"),
                   F.lit(_INF)).alias(_TIE),
    ).select(*l_tagged.columns)  # align union column order

    if bucket_sec is None:
        part_cols = list(on)
        u = l_tagged.unionByName(r_tagged)
    else:
        part_cols = list(on) + [_BKT]
        b_us = int(bucket_sec * 1_000_000)
        bucket = (F.floor(_epoch_us("__asof_ts") / F.lit(b_us))
                  .cast("bigint"))
        lb = l_tagged.withColumn(_BKT, bucket)
        rb = r_tagged.withColumn(_BKT, bucket)

        # best right row per (key, bucket): struct max is lexicographic
        # (ts, tie, pack) — same winner the window's last() would pick
        best = (rb.groupBy(*part_cols)
                .agg(F.max(F.struct(F.col("__asof_ts"), F.col(_TIE),
                                    F.col(_PACK))).alias("__best")))
        # every bucket that contains probe rows needs a carrier
        need = lb.select(*part_cols).distinct()
        wk = (Window.partitionBy(*on).orderBy(F.col(_BKT).asc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carriers = (
            need.join(best, on=part_cols, how="full_outer")
            .withColumn("__carry", F.max("__best").over(wk))
            .join(need, on=part_cols, how="left_semi")  # left buckets only
            .where(F.col("__carry").isNotNull())
            .select(
                *[F.lit(None).cast(left.schema[c].dataType).alias(c)
                  for c in left.columns if c not in on],
                *[F.col(c) for c in on],
                F.col("__carry")[_PACK].alias(_PACK),
                F.col("__carry")["__asof_ts"].alias("__asof_ts"),
                F.lit(0).alias(_SIDE),
                F.col("__carry")[_TIE].alias(_TIE),
                F.col(_BKT),
            ).select(*lb.columns))
        u = lb.unionByName(rb).unionByName(carriers)

    w = (Window.partitionBy(*part_cols)
         .orderBy(F.col("__asof_ts").asc(), F.col(_SIDE).asc(),
                  F.col(_TIE).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn(_PACK, F.last(_PACK, ignorenulls=True).over(w))
    out = (u.where(F.col(_SIDE) == 1)
           .drop(_SIDE, _TIE, "__asof_ts", _BKT))
    if tolerance_sec is not None:
        # null the WHOLE pack when the match is older than the window
        out = out.withColumn(
            _PACK,
            F.when(_epoch_us(left_ts)
                   - F.unix_micros(
                       F.col(_PACK)[right_ts].cast("timestamp"))
                   > int(tolerance_sec * 1_000_000),
                   F.lit(None)).otherwise(F.col(_PACK)))
    out = out.select(
        *[F.col(c) for c in out.columns if c != _PACK],
        *[F.col(_PACK)[c].alias(out_names[c]) for c in carried])
    return out
