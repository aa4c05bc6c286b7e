"""Grouped quantiles: exact (oracle) and approximate (production) paths.

At 100 TB the exact `percentile()` aggregate is the wrong default: it is a
sort-based ObjectHashAggregate that buffers every value of a group (OOM
risk on a hot group, full per-group sort cost). The production path is
`approx_percentile` — Spark's Greenwald-Khanna quantile summary
(org.apache.spark.sql.catalyst.util.QuantileSummaries): a bounded-memory
mergeable sketch with map-side partial aggregation, rank error
<= 1/accuracy. With accuracy=10000 the p50/p90/p99 of a billion-row group
are within 0.01% rank error using a few hundred KB per group — the same
shuffle shape as any other partial-aggregated groupBy.

Rule of thumb (BENCH/BASELINE.md "quantiles at scale"): exact percentile
only when the per-group row count is known-bounded (it is the DuckDB
oracle's estimator, quantile_cont); approx_percentile(accuracy>=10000)
everywhere else.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def grouped_quantiles(df: DataFrame, keys: Sequence[str], value_col: str,
                      probs: Sequence[float] = (0.5, 0.9, 0.99),
                      exact: bool = False, accuracy: int = 10000,
                      round_digits: int | None = 4) -> DataFrame:
    """Per-group quantiles of `value_col` with min/max/count.

    exact=False (default, the scale path) uses approx_percentile with the
    given GK accuracy (rank error <= 1/accuracy). exact=True uses the
    interpolating percentile() aggregate — identical to DuckDB
    quantile_cont, for oracle comparison at test scale only.
    """
    fn = "percentile" if exact else "approx_percentile"
    aggs = []
    for p in probs:
        name = f"p{str(p)[2:].ljust(2, '0')}" if p < 1 else "p100"
        expr = (f"{fn}({value_col}, {p})" if exact
                else f"{fn}({value_col}, {p}, {accuracy})")
        col = F.expr(expr)
        if round_digits is not None:
            col = F.round(col, round_digits)
        aggs.append(col.alias(name))
    v = F.col(value_col)
    aggs += [F.round(F.min(v), round_digits).alias("vmin")
             if round_digits is not None else F.min(v).alias("vmin"),
             F.round(F.max(v), round_digits).alias("vmax")
             if round_digits is not None else F.max(v).alias("vmax"),
             F.count(F.lit(1)).alias("n")]
    return df.groupBy(*keys).agg(*aggs)
