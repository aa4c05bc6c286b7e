"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and, where an
oracle_sql() entry exists, the same query on DuckDB over the same parquet
tables; compares row count, column names, and an order-insensitive value
hash (columns sorted by name, rows sorted, floats rounded).

Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as E  # noqa: E402


def _norm_val(v):
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = round(float(v), 4)
        return str(int(f)) if f.is_integer() else str(f)
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        df[c] = df[c].map(_norm_val)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from cld2_spark.session import get_spark
    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in E.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    only = set(sys.argv[2:])  # optional query-name filter for iteration
    oracles = E.oracle_sql()
    failures = []
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append((name, f"spark error: {exc}"))
            print(f"[FAIL] {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append((name, f"duckdb error: {exc}"))
            print(f"[FAIL] {name}: duckdb error: {exc}")
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"schema {list(g.columns)} vs {list(w.columns)}"))
            print(f"[FAIL] {name}: schema mismatch {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append((name, f"rows {len(g)} vs {len(w)}"))
            print(f"[FAIL] {name}: row count {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            diff = (g != w).any(axis=1).sum()
            failures.append((name, f"{diff} differing rows"))
            print(f"[FAIL] {name}: {diff}/{len(g)} differing rows")
            bad = (g != w).any(axis=1)
            print("  got :", g[bad].head(3).to_dict("records"))
            print("  want:", w[bad].head(3).to_dict("records"))
            continue
        print(f"[OK]   {name}: {len(g)} rows match")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
