"""Single-core langid-kernel micro-benchmark (the VERDICT 'rows/s' basis).

Measures analyze_batch (langid + trigram cross-check + perplexity, the
pipeline's Python stage) on 5,000 transcript turns derived from the sf0.1
documents table -- one process, no Spark. Prints best-of-N rows/s; use the
BEST (steal noise on this shared VM only ever slows a run).

Run:  python tools/kernel_bench.py [n_runs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.1"
BATCH = 5000


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from cld2_spark.kernels.analyze import analyze_batch
    from cld2_spark.kernels.model import default_model
    from cld2_spark.sources.transcripts import transcripts_view_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')")
    rows = con.sql("SELECT text FROM ("
                   + transcripts_view_sql("duckdb", "documents")
                   + f") LIMIT {BATCH}").fetchall()
    texts = [r[0] or "" for r in rows]
    model = default_model()
    analyze_batch(texts[:500], model)  # warm: model load, numpy JIT caches

    best = float("inf")
    for i in range(n_runs):
        t0 = time.monotonic()
        analyze_batch(texts, model)
        dt = time.monotonic() - t0
        best = min(best, dt)
        print(f"run {i}: {len(texts) / dt:.0f} rows/s")
    print(f"BEST: {len(texts) / best:.0f} rows/s "
          f"({best:.2f}s / {len(texts)} turns)")


if __name__ == "__main__":
    main()
