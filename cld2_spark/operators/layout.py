"""Z-order (Morton-curve) data layout — the Iceberg/Delta multi-column
clustering story at 100 TB.

A single-column sort gives data skipping on one predicate column only; a
space-filling curve gives it on SEVERAL at once: interleave the bits of k
normalized columns into one integer `z`, lay files out by z, and every
file's min/max envelope is bounded in EVERY curve dimension — so a scan
with a predicate on ANY of them prunes files from footer stats alone.

The scale-honest shape (and the one implemented here) is PREFIX BUCKETING,
not a global sort: file_id = z >> shift. That is exactly how an engine
writes a z-ordered table at 10^12 rows — one hash-free, map-side-
combinable aggregation per file bucket (or a repartition-by-z write), with
NO global row-numbering / single-partition window anywhere. The curve
arithmetic is pure integer bit algebra (shifts, masks), runs identically
in Spark codegen and DuckDB, so the oracle is live.

`zorder_stats` returns the per-file pruning envelope (row count, min/max
of both curve dimensions, an orderkey checksum) — the artifact a lakehouse
writer would publish to its manifest; tight per-file ranges in BOTH
columns are the measurable proof the layout works.

No analogue in the reference (CLD2 has no storage layout); the target
surface mandates Iceberg-style table layout (BASELINE.json north_star);
cited absence: SURVEY.md SS2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BITS = 11          # bits kept per dimension
FILE_BITS = 6      # file id = top FILE_BITS bits of the 2*BITS-bit curve


def z_expr(a: str, b: str, bits: int = BITS, dialect: str = "spark") -> str:
    """Morton interleave of two nonnegative ints (a even bits, b odd).

    Pure shift/mask algebra — bit k of `a` lands at curve bit 2k, bit k of
    `b` at 2k+1. Identical in Spark SQL and DuckDB; inputs must already be
    reduced mod 2^bits.
    """
    terms = []
    for k in range(bits):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({a}, {k}) & 1, {2 * k})")
            terms.append(f"shiftleft(shiftright({b}, {k}) & 1, {2 * k + 1})")
        else:
            terms.append(f"((({a} >> {k}) & 1) << {2 * k})")
            terms.append(f"((({b} >> {k}) & 1) << {2 * k + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_stats(df: DataFrame, a_sql: str, b_sql: str,
                 checksum_sql: str, bits: int = BITS,
                 file_bits: int = FILE_BITS) -> DataFrame:
    """Per-file pruning envelope of the z-ordered layout of `df`.

    a_sql/b_sql: nonnegative BIGINT curve dimensions (caller normalizes —
    mod/scale so they fit `bits` bits). One map-side-combinable shuffle to
    at most 2^file_bits rows.
    """
    z = z_expr("__za", "__zb", bits, "spark")
    shift = 2 * bits - file_bits
    d = df.select(F.expr(a_sql).cast("long").alias("__za"),
                  F.expr(b_sql).cast("long").alias("__zb"),
                  F.expr(checksum_sql).cast("long").alias("__ck"))
    d = d.select(F.expr(f"shiftright({z}, {shift})").cast("long")
                  .alias("file_id"), "__za", "__zb", "__ck")
    return (d.groupBy("file_id")
             .agg(F.count("*").alias("n_rows"),
                  F.min("__za").alias("min_a"), F.max("__za").alias("max_a"),
                  F.min("__zb").alias("min_b"), F.max("__zb").alias("max_b"),
                  F.sum("__ck").alias("checksum")))


def zorder_stats_oracle_sql(table: str, a_sql: str, b_sql: str,
                            checksum_sql: str, bits: int = BITS,
                            file_bits: int = FILE_BITS) -> str:
    """DuckDB replica of zorder_stats (same bit algebra, live oracle)."""
    z = z_expr("__za", "__zb", bits, "duckdb")
    shift = 2 * bits - file_bits
    return (
        f"WITH zl_in AS (SELECT CAST({a_sql} AS BIGINT) AS __za, "
        f"CAST({b_sql} AS BIGINT) AS __zb, "
        f"CAST({checksum_sql} AS BIGINT) AS __ck FROM {table}), "
        f"zl_z AS (SELECT ({z} >> {shift}) AS file_id, __za, __zb, __ck "
        f"FROM zl_in) "
        f"SELECT CAST(file_id AS BIGINT) AS file_id, "
        f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"MIN(__za) AS min_a, MAX(__za) AS max_a, "
        f"MIN(__zb) AS min_b, MAX(__zb) AS max_b, "
        f"CAST(SUM(__ck) AS BIGINT) AS checksum "
        f"FROM zl_z GROUP BY file_id")
