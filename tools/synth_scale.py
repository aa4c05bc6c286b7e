"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table `factor`x with deterministic decorrelation, so the
bench can be run at 10x data (VERDICT r6 next-round #1: turn plan-shape
scale claims into measured growth curves). No sf1 directory ships with the
sandbox; this builds one.

Decorrelation matters: a naive copy would give every document `factor`
exact duplicates, turning the dedup operators' candidate sets quadratic in
the replica count — a workload no real 10x corpus has. Instead:
  - documents.text: per-replica vowel rotation via translate() — token
    identities change, so replicas are unrelated text to every shingle/
    gram/hash operator, while lengths and whitespace structure (the cost
    drivers) are preserved exactly;
  - embeddings: per-replica index-keyed additive perturbation — replica
    vectors point elsewhere, so ANN/dedup candidate structure stays
    realistic;
  - events: user population offset per replica — sessions, funnels and
    joins scale linearly, as adding new users does;
  - id columns offset by replica * 10^7 everywhere (dup_docs/dup_embs
    views add 10^6, so offsets never collide with planted ids).

Usage: python tools/synth_scale.py /root/testdata/sf0.1 /root/sfsynth/sf1 10
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OFF = 10_000_000

# per-table (id columns to offset, extra per-replica transforms)
VOWS = "aeiou"


def _rot(k: int) -> str:
    r = k % 5
    return VOWS[r:] + VOWS[:r]


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from pyspark.sql import functions as F

    from cld2_spark.session import get_spark

    spark = get_spark("synth-scale", cores=16, shuffle_partitions=16)
    Path(dst).mkdir(parents=True, exist_ok=True)
    tables = ["documents", "embeddings", "events", "customer", "orders",
              "lineitem", "part", "supplier", "nation", "region"]
    small = {"nation", "region"}  # dimension tables: copy, don't replicate
    id_cols = {"documents": ["doc_id"], "embeddings": ["vec_id"],
               "events": ["event_id"], "customer": ["c_custkey"],
               "orders": ["o_orderkey"], "lineitem": ["l_orderkey"],
               "part": ["p_partkey"], "supplier": ["s_suppkey"]}
    for t in tables:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in small:
            out = df
        else:
            parts = []
            for k in range(factor):
                p = df
                for c in id_cols.get(t, []):
                    p = p.withColumn(c, F.col(c) + F.lit(k * OFF))
                if t == "documents" and k > 0:
                    p = p.withColumn(
                        "text", F.translate("text", VOWS, _rot(k)))
                if t == "embeddings" and k > 0:
                    p = p.withColumn(
                        "embedding",
                        F.expr(f"transform(embedding, (x, j) -> "
                               f"x + CAST((j + {k}) % 7 - 3 AS DOUBLE))"))
                if t == "events" and k > 0:
                    p = p.withColumn("user_id",
                                     F.col("user_id") + F.lit(k * OFF))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        n = 16 if t not in small else 1
        (out.repartition(n)
            .write.mode("overwrite").parquet(f"{dst}/{t}.parquet"))
        print(f"{t}: written", flush=True)
    spark.stop()
    (Path(dst) / "_DONE").touch()


if __name__ == "__main__":
    main()
