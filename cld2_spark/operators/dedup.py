"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (shuffle-on-key group-bys and
band-key self-joins -- the scalable shapes) except SimHash's bit-majority
fold, which is a vectorized Pandas UDF (Arrow-batched, no per-row Python).

Scale notes (100TB design point):
  - exact_dedup: one shuffle on a 16-byte hash; skew-free (hashes uniform).
  - minhash_lsh_pairs: banding keeps the self-join restricted to candidate
    buckets; band keys are uniform md5 minima, so the join is skew-free by
    construction. Never computes all-pairs.
  - simhash_pairs: 64-bit fingerprint + banding on 4x16-bit sub-keys
    (hamming<=k candidates share a sub-key by pigeonhole).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

N_BANDS = 4
SHINGLE_K = 5

_SHINGLES = ("transform(sequence(1, greatest(length({col}) - {k1}, 1)), "
             "i -> substring({col}, i, {k}))")


def _shingles_expr(col: str, k: int = SHINGLE_K) -> str:
    return _SHINGLES.format(col=col, k=k, k1=k - 1)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text hash. One shuffle."""
    h = F.md5(F.col(text_col))
    w = df.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "__h"], "inner").drop("__h")


ROWS_PER_BAND = 3  # r: per-band collision prob = jaccard**r


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       n_bands: int = N_BANDS, k: int = SHINGLE_K) -> DataFrame:
    """Per-row LSH band signatures: each band = md5 of r=3 min-wise md5
    minima, so a band collision implies jaccard**3-probability agreement
    (keeps vocabulary-overlap noise out of the candidate set)."""
    sh = _shingles_expr(text_col, k)
    out = df.withColumn("__sh", F.expr(sh))
    for b in range(n_bands):
        mins = ", ".join(
            f"array_min(transform(__sh, s -> md5(concat('{ROWS_PER_BAND * b + r}_', s))))"
            for r in range(ROWS_PER_BAND))
        out = out.withColumn(f"band{b}", F.expr(f"md5(concat_ws('|', {mins}))"))
    return out.drop("__sh")


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_bands: int = N_BANDS, k: int = SHINGLE_K,
                      min_jaccard_pct: int = 50) -> DataFrame:
    """Candidate id-pairs via LSH banding, then ONE join back to shingle
    sets for exact Jaccard verification. Ids-only through the band
    self-join: no arrays ride the shuffle (the 100TB-safe shape)."""
    base = df.select(id_col, text_col).where(F.length(text_col) >= k)
    sigs = minhash_signatures(base, text_col, n_bands, k)
    stacked = None
    for b in range(n_bands):
        part = sigs.select(F.col(f"band{b}").alias("band_key"),
                           F.col(id_col).alias("id"))
        stacked = part if stacked is None else stacked.unionAll(part)
    x, y = stacked.alias("x"), stacked.alias("y")
    cand = (x.join(y, (F.col("x.band_key") == F.col("y.band_key"))
                   & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct())
    sets = base.select(F.col(id_col).alias("id"),
                       F.array_distinct(F.expr(_shingles_expr(text_col, k))).alias("s"))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s")))
    union = F.size(F.col("sa.s")) + F.size(F.col("sb.s")) - inter
    return (cand.join(sa, F.col("a") == F.col("sa.id"))
            .join(sb, F.col("b") == F.col("sb.id"))
            .select("a", "b", F.floor(inter * 100 / union).cast("int").alias("jacc_pct"))
            .where(F.col("jacc_pct") >= min_jaccard_pct))


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per text, fully vectorized across the batch.

    Shingle hash = polynomial rolling hash over codepoints + fmix64 finisher
    (deterministic, no per-row Python). Bit-majority fold via one scatter-add.
    """
    from cld2_spark.kernels import unicode_tables as ut

    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.int64)
    joined = "\x00".join(texts)
    cp = ut.codepoints_of(joined).astype(np.uint64)
    lens = np.fromiter((len(t) for t in texts), count=n, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])

    K = SHINGLE_K
    P = np.uint64(0x100000001B3)  # FNV-ish odd multiplier
    with np.errstate(over="ignore"):
        h = np.zeros(max(len(cp) - K + 1, 0), dtype=np.uint64)
        for j in range(K):
            h = h * P + cp[j:len(cp) - K + 1 + j]
        # fmix64 (public-domain MurmurHash3 finisher)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)

    # valid shingles: fully inside one text (no separator) and text long enough
    idx = np.arange(len(h), dtype=np.int64)
    rid = np.searchsorted(starts, idx, side="right") - 1
    end_of_row = starts[rid] + lens[rid]
    valid = idx + K <= end_of_row
    h, rid = h[valid], rid[valid]

    bit_cols = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    bits = ((h[:, None] & bit_cols) != 0).astype(np.int64) * 2 - 1  # (N,64) in {-1,1}
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, rid, bits)
    sim = (acc > 0).astype(np.uint64)
    return (sim * bit_cols).sum(axis=1).astype(np.uint64).view(np.int64)


@F.pandas_udf(LongType())
def _simhash64(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield pd.Series(simhash64_batch(s.fillna("").tolist()))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4x16-bit
    sub-keys (hamming <= 3 pairs must share one), verify hamming distance."""
    fp = df.select(id_col, _simhash64(F.col(text_col)).alias("fp"))
    parts = []
    for b in range(4):
        sub = F.shiftright(F.col("fp"), 16 * b).bitwiseAND(F.lit(0xFFFF))
        parts.append(fp.select(F.col(id_col).alias("id"), "fp",
                               F.concat(F.lit(f"{b}_"), sub.cast("string")).alias("band_key")))
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionAll(p)
    x, y = stacked.alias("x"), stacked.alias("y")
    ham = F.bit_count(F.col("x.fp").bitwiseXOR(F.col("y.fp")))
    return (x.join(y, (F.col("x.band_key") == F.col("y.band_key"))
                   & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                    ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming)
            .distinct())
