"""Exact distributed prefix sum (parallel scan) over a global ordering.

A global running total is the textbook scale trap: `Window.orderBy(...)`
with no partition key plans as ONE task holding the whole corpus. The
correct distributed shape is the two-level scan every parallel-prefix
algorithm uses (Blelloch 1990), and it composes from plain DataFrame
ops:

  1. range-partition the rows by the global order keys
     (`repartitionByRange` — the terasort exchange, so partition id
     order == key order),
  2. a per-partition running sum (Window PARTITION BY the partition id —
     distributed, each group is one partition's rows),
  3. per-partition totals -> a tiny (num_partitions)-row table whose own
     running sum gives each partition's starting offset, broadcast back.

Cost: the one range exchange any global ordering needs, a window whose
groups are partition-sized, and a broadcast of `num_partitions` rows.
The result is EXACT and engine-independent whenever the order keys are
globally unique (ties would make "running" ambiguous in any engine), so
a DuckDB `SUM(...) OVER (ORDER BY ...)` replays it bit-for-bit — which
is how the `ccnet_buckets` oracle checks this operator live.

No analogue in the reference (CLD2 has no ordered-aggregation surface);
cited absence: SURVEY.md SS2.13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PID = "__scan_pid"
_LOCAL = "__scan_local"


def running_total(df: DataFrame, order_keys: list[str], value_col: str,
                  out_col: str = "cum", num_partitions: int | None = None
                  ) -> DataFrame:
    """Inclusive prefix sum of `value_col` over the global ordering given
    by `order_keys` (which must be globally unique together). Adds
    `out_col`; preserves all input columns.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    keys: list[Column] = [F.col(k) for k in order_keys]
    ranged = (df.repartitionByRange(n, *keys)
                .withColumn(_PID, F.spark_partition_id()))
    w = Window.partitionBy(_PID).orderBy(*keys)
    local = ranged.withColumn(_LOCAL, F.sum(value_col).over(w))
    # tiny side: one row per partition -> exclusive offsets
    totals = (local.groupBy(_PID)
              .agg(F.sum(value_col).alias("__tot")))
    off_w = (Window.orderBy(_PID)
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        _PID, F.coalesce(F.sum("__tot").over(off_w), F.lit(0))
        .alias("__off"))
    return (local.join(F.broadcast(offsets), _PID)
            .withColumn(out_col, (F.col(_LOCAL) + F.col("__off"))
                        .cast("bigint"))
            .drop(_PID, _LOCAL, "__off"))
