"""Deduplication operators for large-scale training-data pipelines.

All operators are pure DataFrame compositions (shuffle-on-key group-bys and
band-key self-joins -- the scalable shapes) except SimHash's bit-majority
fold, which is a vectorized Pandas UDF (Arrow-batched, no per-row Python).

Scale notes (100TB design point):
  - exact_dedup: one shuffle on a 16-byte hash; skew-free (hashes uniform).
  - minhash_lsh_pairs: banding keeps the self-join restricted to candidate
    buckets. ONE md5 per distinct shingle; the 12-member hash family is
    derived by affine maps modulo a Mersenne prime (standard MinHash
    practice), so the dominant cost is cheap JVM arithmetic, not 12 digest
    calls per shingle.
  - band-bucket size cap (both pair operators): a band key shared by D
    near-identical docs would otherwise yield D^2 candidate pairs --
    boilerplate-heavy corpora (exactly what dedup targets) make one bucket
    quadratic. Buckets larger than `bucket_cap` are star-reduced: every
    member pairs only with the bucket's min id (linear, still connects the
    duplicate group transitively through its representative).
  - simhash_pairs: 62-bit fingerprint banded into 4 sub-keys (pigeonhole:
    hamming<=3 pairs share at least one). The fingerprint is two 31-bit
    polynomial rolling hashes over codepoints, combined -- chosen over a
    64-bit fmix construction so the exact computation is expressible in
    engine-portable SQL (mod-2^63-safe arithmetic) for the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType

N_BANDS = 4
SHINGLE_K = 5
ROWS_PER_BAND = 3  # r: per-band collision prob = jaccard**r
BUCKET_CAP = 64    # band buckets above this are star-reduced (see module doc)

MERSENNE31 = 2147483647  # 2^31 - 1

# Affine MinHash family: h_i(x) = (A[i]*x + B[i]) mod p over x = H(s) mod p.
# Fixed Knuth-style multiplicative constants; inlined as literals into both
# the Spark and DuckDB SQL so the two engines agree bit-for-bit.
_N_HASHES = N_BANDS * ROWS_PER_BAND
HASH_A = [(1566083941 * (i + 1)) % MERSENNE31 for i in range(_N_HASHES)]
HASH_B = [(2654435769 * (i + 1)) % MERSENNE31 for i in range(_N_HASHES)]

# SimHash rolling-hash parameters (two independent 31-bit Horner hashes)
SIMHASH_P1 = 1000003
SIMHASH_P2 = 16777619
SIMHASH_BITS = 62
# 4 band sub-keys over the 62-bit fingerprint: 16+16+15+15
SIMHASH_BANDS = [(0, 0xFFFF), (16, 0xFFFF), (32, 0x7FFF), (47, 0x7FFF)]

_SHINGLES = ("transform(sequence(1, greatest(length({col}) - {k1}, 1)), "
             "i -> substring({col}, i, {k}))")

# DataFrames persisted by the operators below (ADVICE r2 #1): each new
# invocation releases the previous invocation's cached blocks FOR THE SAME
# SparkSession (ADVICE r3: keyed by session so two sessions in one process
# cannot drop each other's persists), and `release_dedup_caches()` with no
# session drops everything -- so long-lived sessions never accumulate
# BlockManager entries. Unpersisting a still-lazy prior result is safe (it
# recomputes); callers wanting to hold results across repeated invocations
# should materialize (write/collect) first. The registry is NOT
# thread-safe: concurrent dedup calls on the same session from different
# threads can unpersist each other mid-job (documented limitation; Spark
# jobs themselves recompute lost blocks, so results stay correct).
_live_caches: list[tuple[int, DataFrame]] = []


def _session_alive(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc is not None
    except Exception:
        return False


def release_dedup_caches(blocking: bool = False, session=None) -> None:
    """Unpersist DataFrames cached by prior dedup-operator calls --
    `session`'s only, or all when session is None. Entries whose session
    has stopped are always pruned, so a multi-session process cannot
    accumulate dead references."""
    global _live_caches
    keep: list[tuple[int, DataFrame]] = []
    for sid, df in _live_caches:
        if session is not None and sid != id(session) and _session_alive(df):
            keep.append((sid, df))
            continue
        try:
            df.unpersist(blocking)
        except Exception:
            pass  # session already stopped
    _live_caches = keep


def _persist_tracked(df: DataFrame) -> DataFrame:
    df = df.persist()
    _live_caches.append((id(df.sparkSession), df))
    return df


def _spread_pairs(cand: DataFrame) -> DataFrame:
    """Round-robin the ids-only candidate pairs across the cluster before
    the compute-heavy verify join. The candidate relation is a few bytes
    per row, so AQE's byte-based partition coalescing collapses its
    shuffle output to one partition -- and the exact verification
    downstream (array_intersect over per-doc hash sets attached by
    broadcast join) then runs single-threaded (measured: a 4.6 s 1-task
    stage inside minhash_pairs at sf0.1/local[32]; 5.9 s -> 2.3 s warm
    from this repartition). The exchange itself ships ids only; rows /
    cores is the right split for a compute-bound stage at any scale."""
    return cand.repartition(cand.sparkSession.sparkContext.defaultParallelism)


def _shingles_expr(col: str, k: int = SHINGLE_K) -> str:
    return _SHINGLES.format(col=col, k=k, k1=k - 1)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text hash. One shuffle."""
    h = F.md5(F.col(text_col))
    w = df.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "__h"], "inner").drop("__h")


def shingle_hash_expr(shingle_var: str, dialect: str) -> str:
    """60-bit base hash of one shingle: int(md5(s)[:15], 16) mod p."""
    if dialect == "spark":
        return (f"CAST(conv(substring(md5({shingle_var}), 1, 15), 16, 10) AS BIGINT)"
                f" % {MERSENNE31}")
    return f"('0x' || substr(md5({shingle_var}), 1, 15))::BIGINT % {MERSENNE31}"


def minhash_min_exprs(dialect: str, hs_col: str = "hs",
                      n_hashes: int = _N_HASHES) -> list[str]:
    """The individual affine-minhash minimum expressions (the full
    n_hashes-value signature; bands are triples of these)."""
    xform = "transform" if dialect == "spark" else "list_transform"
    amin = "array_min" if dialect == "spark" else "list_min"
    return [f"{amin}({xform}({hs_col}, h -> "
            f"({HASH_A[i]} * h + {HASH_B[i]}) % {MERSENNE31}))"
            for i in range(n_hashes)]


def minhash_band_exprs(dialect: str, hs_col: str = "hs",
                       n_bands: int = N_BANDS) -> list[str]:
    """Band-key expressions over a column holding the base-hash array."""
    mins = minhash_min_exprs(dialect, hs_col, ROWS_PER_BAND * n_bands)
    return ["concat_ws('_', " + ", ".join(mins[ROWS_PER_BAND * b:
                                               ROWS_PER_BAND * (b + 1)]) + ")"
            for b in range(n_bands)]


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       n_bands: int = N_BANDS, k: int = SHINGLE_K,
                       with_minima: bool = False) -> DataFrame:
    """Per-row LSH band signatures: each band = r=3 affine-minhash minima
    joined with '_', so a band collision implies jaccard**3-probability
    agreement (keeps vocabulary-overlap noise out of the candidate set).
    MinHash over distinct shingles equals MinHash over the multiset (min is
    duplicate-invariant), so the base hash is computed once per distinct
    shingle. with_minima=True adds `mh`: the full 12-value signature array
    (useful for signature-level similarity estimates downstream; the pairs
    operator itself does not consume it -- see minhash_lsh_pairs)."""
    sh = f"array_distinct({_shingles_expr(text_col, k)})"
    hs = f"transform({sh}, s -> {shingle_hash_expr('s', 'spark')})"
    out = df.withColumn("__hs", F.expr(hs))
    for b, expr in enumerate(minhash_band_exprs("spark", "__hs", n_bands)):
        out = out.withColumn(f"band{b}", F.expr(expr))
    if with_minima:
        mins = minhash_min_exprs("spark", "__hs", ROWS_PER_BAND * n_bands)
        out = out.withColumn("mh", F.expr("array(" + ", ".join(mins) + ")"))
    return out.drop("__hs")


def capped_band_pairs(stacked: DataFrame, bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """Candidate id-pairs from a (band_key, id) relation with skew guard.

    Buckets of size <= bucket_cap: full within-bucket pairing. Larger
    buckets: star reduction (min id x every other member) -- linear in the
    bucket size, so a 10K-copy boilerplate group costs 10K pairs, not 10^8.

    CONSUMER CONTRACT (ADVICE r2 #2): star-reduced buckets emit only
    (representative, member) pairs, and downstream verification judges each
    pair independently -- so a genuine near-dup pair (b, c) inside a big
    bucket is reported only transitively through the representative, and a
    member that fails verification against the representative drops out of
    the group. Consumers that need whole duplicate GROUPS (e.g. keep-one
    dedup) must take CONNECTED COMPONENTS over the verified pairs rather
    than treating each pair as a standalone duplicate relation.
    """
    # (band_key, id) is scanned by the stats agg and both join sides;
    # persist so the upstream shingle/fingerprint work runs exactly once
    # (at scale this is the natural checkpoint: a narrow two-column relation)
    stacked = _persist_tracked(stacked)
    stats = (stacked.groupBy("band_key")
             .agg(F.count(F.lit(1)).alias("c"), F.min("id").alias("m")))
    small_keys = stats.where(F.col("c") <= bucket_cap).select("band_key")
    big_keys = stats.where(F.col("c") > bucket_cap).select("band_key", "m")
    sm = stacked.join(small_keys, "band_key")
    x = sm.select(F.col("band_key"), F.col("id").alias("a"))
    y = sm.select(F.col("band_key"), F.col("id").alias("b"))
    small = (x.join(y, "band_key")
             .where(F.col("a") < F.col("b"))
             .select("a", "b"))
    big = (stacked.join(big_keys, "band_key")
           .where(F.col("id") > F.col("m"))
           .select(F.col("m").alias("a"), F.col("id").alias("b")))
    return small.unionAll(big).distinct()


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      n_bands: int = N_BANDS, k: int = SHINGLE_K,
                      min_jaccard_pct: int = 50,
                      bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """Candidate id-pairs via LSH banding (skew-capped), then exact Jaccard
    verification over the 60-bit shingle-HASH sets.

    Shuffle shape at 100TB: ids-only through the band self-join; the verify
    join ships int64 hash arrays, not shingle strings (several times faster
    to intersect, ~3x fewer bytes; both engines derive identical hashes so
    results agree bit-for-bit -- a cross-shingle collision would alter both
    sides identically).

    A sketch-first signature-agreement prefilter (VERDICT r2 #7) was built
    and then REMOVED as measured-vacuous: every LSH candidate exists via a
    full r=3 band collision, so it agrees on >= 3 of the 12 signature
    positions by construction -- exactly the half-target threshold for
    J>=50% -- and the prefilter dropped 0 of 95,362 candidates at sf0.1
    while costing two extra all-candidate joins. r=3 banding itself is the
    prefilter (per-band collision probability J^3)."""
    release_dedup_caches(session=df.sparkSession)
    base = df.select(id_col, text_col).where(F.length(text_col) >= k)
    sh = f"array_distinct({_shingles_expr(text_col, k)})"
    hs = (f"array_distinct(transform({sh}, "
          f"s -> {shingle_hash_expr('s', 'spark')}))")
    # ONE shingle+md5 pass feeds everything: the distinct-hash sets are
    # persisted first and BOTH the band keys and the verify join read
    # them from cache. The affine band minima over the distinct-hash SET
    # equal the minima over the per-shingle hash multiset (an affine map
    # is a function: min f(x) over a multiset == min over its support),
    # so deriving bands from `s` is bit-identical to hashing the
    # shingles again -- and saves the operator's single most expensive
    # expression (per-shingle md5) a full second evaluation.
    sets = _persist_tracked(
        base.select(F.col(id_col).alias("id"), F.expr(hs).alias("s")))
    # posexplode, NOT a 4-way union of selects: a union re-evaluates the
    # band-minimum subtree once per branch; exploding an array of the
    # band columns scans the cached hash sets exactly once
    band_exprs = minhash_band_exprs("spark", "s", n_bands)
    stacked = sets.select(
        F.col("id"),
        F.posexplode(F.array(*[F.expr(b) for b in band_exprs]))
        .alias("pos", "bk")
    ).select(F.concat_ws("|", F.col("pos"), F.col("bk")).alias("band_key"), "id")
    cand = _spread_pairs(capped_band_pairs(stacked, bucket_cap))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s")))
    union = F.size(F.col("sa.s")) + F.size(F.col("sb.s")) - inter
    return (cand.join(sa, F.col("a") == F.col("sa.id"))
            .join(sb, F.col("b") == F.col("sb.id"))
            .select("a", "b", F.floor(inter * 100 / union).cast("int").alias("jacc_pct"))
            .where(F.col("jacc_pct") >= min_jaccard_pct))


def _word_gram_hash_expr(text_col: str, n: int) -> tuple[str, str]:
    """(row_filter, hash_array_expr) for distinct word-n-gram hashes of a
    text column -- whitespace-normalized lowercase tokens, n-grams joined
    with single spaces, each hashed with the shared 60-bit md5 hash."""
    tk = (f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
          )
    grams = (f"transform(sequence(1, size({tk}) - {n - 1}), "
             f"i -> concat_ws(' ', slice({tk}, i, {n})))")
    hs = (f"array_distinct(transform({grams}, "
          f"g -> {shingle_hash_expr('g', 'spark')}))")
    return f"size({tk}) >= {n}", hs


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 2,
                        min_common: int = 2, df_cap: int = BUCKET_CAP,
                        min_jaccard_pct: int = 50) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard with DETERMINISTIC candidate
    generation: an inverted index over n-gram hashes proposes every pair
    sharing >= `min_common` indexed grams, then exact Jaccard over the
    distinct-gram hash sets verifies. Complements MinHash banding
    (probabilistic recall) -- here recall is exact for any pair sharing
    min_common grams whose document frequency is within `df_cap`.

    Returns (a, b, common, jacc_pct): `common` counts shared INDEXED grams
    (df in [2, df_cap]); `jacc_pct` is exact over all distinct grams.

    Scale shape at 100TB: the inverted index is a narrow (hash, id)
    relation shuffled on the hash; per-gram pairing cost is bounded by
    df_cap^2 because grams hotter than df_cap are PRUNED from the index
    (stop-gram pruning -- the standard guard against boilerplate: a gram
    appearing in a million docs carries no dedup signal but would emit
    10^12 pairs). Unlike the star-reduction cap of the banding operators,
    pruning loses only that gram's candidate evidence -- true duplicates
    share many non-hot grams and still reach min_common. The verify join
    ships int64 hash arrays, same as minhash_lsh_pairs."""
    release_dedup_caches(session=df.sparkSession)
    row_filter, hs = _word_gram_hash_expr(text_col, n)
    base = df.select(id_col, text_col).where(F.expr(row_filter))
    sets = _persist_tracked(
        base.select(F.col(id_col).alias("id"), F.expr(hs).alias("s")))
    tok = sets.select("id", F.explode("s").alias("h"))
    keep = (tok.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
            .where((F.col("c") >= 2) & (F.col("c") <= df_cap))
            .select("h"))
    tok2 = tok.join(keep, "h")
    x = tok2.select("h", F.col("id").alias("a"))
    y = tok2.select("h", F.col("id").alias("b"))
    # NO _spread_pairs here: the df-cap + min_common inverted-index
    # prefilter already thins candidates to near the true-pair count, so
    # the verify stage is light and the extra exchange costs more than
    # it buys (measured 1.6 s -> 1.9 s WITH the spread at sf0.1);
    # contrast minhash_lsh_pairs, whose band collisions are bulky.
    cand = (x.join(y, "h").where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
            .where(F.col("common") >= min_common))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s")))
    union = F.size(F.col("sa.s")) + F.size(F.col("sb.s")) - inter
    return (cand.join(sa, F.col("a") == F.col("sa.id"))
            .join(sb, F.col("b") == F.col("sb.id"))
            .select("a", "b", F.col("common").cast("int").alias("common"),
                    F.floor(inter * 100 / union).cast("int").alias("jacc_pct"))
            .where(F.col("jacc_pct") >= min_jaccard_pct))


def simhash62_batch(texts: list[str]) -> np.ndarray:
    """62-bit SimHash per text, fully vectorized across the batch.

    Shingle hash = two independent 31-bit polynomial (Horner) hashes over
    codepoints modulo 2^31-1, packed as h1 | h2<<31. Bit-majority fold via
    one scatter-add. Exactly reproducible in portable SQL (the DuckDB
    oracle in __spark_entry__ computes the same fingerprints).

    Texts shorter than SHINGLE_K codepoints yield fingerprint -1 (callers
    filter them; -1 never collides with a real 62-bit value).
    """
    from cld2_spark.kernels import unicode_tables as ut

    n = len(texts)
    out = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return out
    joined = "\x00".join(texts)
    cp = ut.codepoints_of(joined).astype(np.int64)
    lens = np.fromiter((len(t) for t in texts), count=n, dtype=np.int64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])

    K = SHINGLE_K
    n_sh = max(len(cp) - K + 1, 0)
    h1 = np.zeros(n_sh, dtype=np.int64)
    h2 = np.zeros(n_sh, dtype=np.int64)
    for j in range(K):
        c = cp[j:n_sh + j]
        h1 = (h1 * SIMHASH_P1 + c) % MERSENNE31
        h2 = (h2 * SIMHASH_P2 + c) % MERSENNE31
    h = h1 | (h2 << 31)  # 62-bit, non-negative in int64

    # valid shingles: fully inside one text (no separator crossing)
    idx = np.arange(n_sh, dtype=np.int64)
    rid = np.searchsorted(starts, idx, side="right") - 1
    end_of_row = starts[rid] + lens[rid]
    valid = idx + K <= end_of_row
    h, rid = h[valid], rid[valid]

    # majority fold: one weighted bincount per bit (measured: 6-15x faster
    # than add.at / reduceat segment sums at millions of shingles; weights
    # are exact in float64 up to 2^53)
    cnt = np.bincount(rid, minlength=n)
    fp = np.zeros(n, dtype=np.int64)
    half = cnt  # strict majority: 2*ones > cnt
    for j in range(SIMHASH_BITS):
        ones = np.bincount(rid, weights=(h >> np.int64(j)) & 1, minlength=n)
        fp |= (2 * ones > half).astype(np.int64) << np.int64(j)
    return np.where(lens >= K, fp, np.int64(-1))


@F.pandas_udf(LongType())
def _simhash62(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield pd.Series(simhash62_batch(s.fillna("").tolist()))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3,
                  bucket_cap: int = BUCKET_CAP) -> DataFrame:
    """Near-dup pairs by SimHash: band the 62-bit fingerprint into 4
    sub-keys (hamming <= 3 pairs must share one by pigeonhole), verify
    hamming distance. Rows shorter than SHINGLE_K codepoints are excluded
    up front (a degenerate shared fingerprint would pair all short rows)."""
    release_dedup_caches(session=df.sparkSession)
    # (id, fp) is scanned by the banding explode and both verify-join
    # sides; persist so the fingerprint UDF runs exactly once
    fp = _persist_tracked(
        df.where(F.length(text_col) >= SHINGLE_K)
        .select(id_col, _simhash62(F.col(text_col)).alias("fp")))
    # posexplode: one pass over the fingerprint UDF output (a union of
    # per-band selects would re-run the UDF once per band)
    band_cols = [
        F.concat(F.lit(f"{b}_"),
                 F.shiftright(F.col("fp"), shift).bitwiseAND(F.lit(mask))
                 .cast("string"))
        for b, (shift, mask) in enumerate(SIMHASH_BANDS)]
    ids = (fp.select(F.col(id_col).alias("id"),
                     F.explode(F.array(*band_cols)).alias("band_key"))
           .select("band_key", "id"))
    cand = capped_band_pairs(ids, bucket_cap)
    fa = fp.select(F.col(id_col).alias("a"), F.col("fp").alias("fpa"))
    fb = fp.select(F.col(id_col).alias("b"), F.col("fp").alias("fpb"))
    ham = F.bit_count(F.col("fpa").bitwiseXOR(F.col("fpb"))).cast("int")
    return (cand.join(fa, "a").join(fb, "b")
            .select("a", "b", ham.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# Backwards-compatible alias (round-1 name)
simhash64_batch = simhash62_batch


def connected_components(pairs: DataFrame, id_a: str = "a", id_b: str = "b",
                         max_iter: int = 12) -> DataFrame:
    """Duplicate-GROUP assignment: min-label connected components over a
    verified near-dup pair list -- the consumer side of the star-reduction
    contract above (a member of a capped bucket is connected to its group
    only transitively through the bucket representative, so group recovery
    REQUIRES transitive closure, not just the raw pair list).

    Returns (doc_id, group_id): every id appearing in `pairs`, labeled with
    the smallest id reachable from it. Keep-one-per-group dedup is then
    `WHERE doc_id != group_id` -> drop list.

    Algorithm: min-label propagation with pointer jumping over the
    undirected edge list (the DataFrame form of the MapReduce CC rounds of
    Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Each round takes every node's min over its own label, its
    neighbors' labels, AND its label's label (the pointer jump) -- label
    distance roughly doubles per round, so convergence needs O(log
    diameter) rounds, not O(diameter): `max_iter=12` covers diameters in
    the thousands, far past anything a near-dup graph produces. Post-cap
    duplicate groups are stars through their representative (diameter <=
    2), converging in 2-3 rounds. If the loop still exhausts `max_iter`
    without converging, a RuntimeWarning is raised rather than silently
    returning split groups.

    100TB design: each round shuffles narrow two-column relations on the
    node id (neighbor join + pointer-jump self-join + groupBy-min); edges
    are persisted and reused across rounds; convergence is detected with
    a per-round any-label-changed EXISTS probe (limit(1).count()), never
    a collect of the labels themselves. Each round's labels are
    localCheckpoint(eager=True)-ed: the pointer-jump SELF-join references
    the previous round's plan twice, so without truncation the logical
    plan doubles per round (measured: driver OOM at ~10 rounds even on a
    41-node graph). On a real cluster prefer a reliable checkpoint dir
    (sc.setCheckpointDir + .checkpoint()) so rounds survive executor loss.

    Cache lifecycle: every superseded round's checkpoint blocks are freed
    eagerly inside the loop (tracked by RDD id -- at most two label-table
    copies are ever live); the returned label relation is the final
    materialized checkpoint, freed when it is garbage collected. The edge
    list is unpersisted here.
    """
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("lab", F.col("id")))
    sc = pairs.sparkSession.sparkContext

    def _persist_ids() -> set:
        # py4j internal (ADVICE r3): on Spark versions where _jsc moved,
        # degrade to NO eager block release -- the ContextCleaner still
        # frees superseded checkpoints on GC, just later. Verified against
        # Spark 4.1.
        try:
            return set(sc._jsc.getPersistentRDDs().keySet().toArray())
        except Exception:
            return set()

    changed = 0
    prev_ckpt_ids: list = []
    try:
        for _ in range(max_iter):
            nbr = (edges.join(labels.withColumnRenamed("id", "src"), "src")
                   .select(F.col("dst").alias("id"), "lab"))
            jump = (labels.alias("x")
                    .join(labels.alias("y"),
                          F.col("x.lab") == F.col("y.id"))
                    .select(F.col("x.id").alias("id"),
                            F.col("y.lab").alias("lab")))
            before = _persist_ids()
            new_labels = (labels.union(nbr).union(jump).groupBy("id")
                          .agg(F.min("lab").alias("lab"))
                          .localCheckpoint(eager=True))
            new_ids = _persist_ids() - before
            changed = (labels.withColumnRenamed("lab", "old")
                       .join(new_labels, "id")
                       .where(F.col("lab") != F.col("old"))
                       .limit(1).count())
            # Free the PREVIOUS round's checkpoint blocks now that this
            # round is fully materialized and the convergence probe has
            # read prev for the last time -- without this, up to max_iter
            # label-table copies accumulate in block storage until the
            # ContextCleaner's GC-driven cleanup. (Checkpoint RDD ids are
            # tracked via the public getPersistentRDDs map; unpersisting a
            # locally-checkpointed RDD logs a WARN that it cannot be
            # recomputed -- intended: prev is never referenced again.)
            try:
                jmap = sc._jsc.getPersistentRDDs()
                for rid in prev_ckpt_ids:
                    jr = jmap.get(rid)
                    if jr is not None:
                        jr.unpersist(False)
            except Exception:
                pass  # no eager release on this Spark (see _persist_ids)
            prev_ckpt_ids = list(new_ids)
            labels = new_labels
            if changed == 0:
                break
        if changed:
            import warnings
            warnings.warn(
                f"connected_components did not converge in {max_iter} "
                f"rounds; group_ids may be split across components",
                RuntimeWarning)
        return labels.select(F.col("id").alias("doc_id"),
                             F.col("lab").alias("group_id"))
    finally:
        edges.unpersist()


def duplicated_spans(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", w: int = 16) -> DataFrame:
    """Exact duplicated-substring detection at token-window granularity
    (the hashed-shingle formulation of Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": any `w`-token window
    occurring in two different documents is a verbatim cross-document
    duplicate span worth cutting, not just down-weighting).

    Every document emits one hash per token position (a rolling window of
    `w` whitespace tokens, md5 over the space-joined window); a single
    count aggregate keyed by the hash finds windows seen in >= 2 distinct
    documents. Returns (span_hash, n_docs, n_occ, first_doc).

    Scale shape at 100TB: this is the distributed alternative to the
    paper's suffix array -- the shuffle ships exactly one (hash, doc_id)
    row per token of corpus, all aggregates are map-side combinable
    (count-distinct over doc_id is a two-level agg Spark rewrites to
    partial aggregation), and there is no candidate join at all. md5 is
    used here because the DuckDB oracle must reproduce it bit-for-bit;
    in production swap the hash expr for xxhash64(window) to ship 8-byte
    keys instead of 32-byte hex strings (4x less shuffle volume) --
    everything downstream is hash-agnostic.
    """
    tk = (f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), "
          f"' ')")
    wins = (f"transform(sequence(1, size({tk}) - {w - 1}), "
            f"i -> md5(array_join(slice({tk}, i, {w}), ' ')))")
    rows = (df.where(F.expr(f"size({tk}) >= {w}"))
            .select(F.col(id_col), F.explode(F.expr(wins)).alias("span_hash")))
    return (rows.groupBy("span_hash")
            .agg(F.countDistinct(id_col).alias("n_docs"),
                 F.count(F.lit(1)).alias("n_occ"),
                 F.min(id_col).alias("first_doc"))
            .where(F.col("n_docs") >= 2))


def duplicated_spans_duck_sql(w: int = 16, table: str = "dup_docs",
                              text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    """DuckDB replay of duplicated_spans (1-based inclusive list slices;
    range() is end-exclusive, so the last window start is len-w+1).
    Returns CTE bodies + SELECT without a leading WITH so callers can
    splice it after their own CTE prelude (dup_docs lives there)."""
    tk = (f"string_split(trim(regexp_replace(lower({text_col}), "
          f"'\\s+', ' ', 'g')), ' ')")
    return (
        f"ds_t AS (SELECT {id_col}, {tk} AS toks FROM {table}), "
        f"ds_w AS (SELECT {id_col}, unnest(list_transform("
        f"  range(1, len(toks) - {w - 2}), "
        f"  i -> md5(array_to_string(toks[i:i+{w - 1}], ' ')))) AS span_hash "
        f"  FROM ds_t WHERE len(toks) >= {w}) "
        f"SELECT span_hash, COUNT(DISTINCT {id_col}) AS n_docs, "
        f"CAST(COUNT(*) AS BIGINT) AS n_occ, MIN({id_col}) AS first_doc "
        f"FROM ds_w GROUP BY span_hash HAVING COUNT(DISTINCT {id_col}) >= 2")


def incremental_dedup(batch: DataFrame, seen: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup -- the production shape for a GROWING
    corpus: a new ingest batch is deduplicated against the
    already-curated corpus without ever re-scanning or re-shuffling the
    curated documents themselves, then within itself.

    Returns (keep_id, text_hash, n_copies): one row per content hash of
    `batch` that is NOT present in `seen`, keeping the minimum id, with
    the batch-internal copy count.

    Scale shape at 100TB: the curated side travels as DISTINCT content
    hashes only (32 hex bytes/row here; xxhash64 in production for 8) --
    the full curated text never moves. The anti join shuffles on the
    hash, both sides uniform by construction, so AQE needs no skew
    handling; when the curated hash set fits executor memory it
    broadcast-anti-joins and the batch side never shuffles at all. This
    is also the natural place for a Bloom prefilter (build on the seen
    hashes, filter the batch map-side, anti-join only survivors) -- the
    exact anti join stays as the verify stage, so results are identical.
    """
    # NULL texts are excluded on BOTH sides: a NULL hash can never equal
    # anything (left_anti would silently keep such rows while a SQL NOT IN
    # oracle would return nothing), so the contract is NULL-free by rule
    bh = (batch.where(F.col(text_col).isNotNull())
          .select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash")))
    sh = (seen.where(F.col(text_col).isNotNull())
          .select(F.md5(F.col(text_col)).alias("text_hash")).distinct())
    fresh = bh.join(sh, "text_hash", "left_anti")
    return (fresh.groupBy("text_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .select("keep_id", "text_hash", "n_copies"))


BLOOM_BITS_DEFAULT = 1 << 22        # 4 Mbit = 512 KiB bitmap
BLOOM_HASHES = 4


def _bloom_positions(h_u64: "np.ndarray", n_bits: int, k: int):
    """k bit positions per 64-bit hash via Kirsch-Mitzenmacher double
    hashing: pos_i = (h1 + i*h2) mod n_bits with h1/h2 the hash halves
    (h2 forced odd). Pure uint64 arithmetic — reproducible identically
    on the JVM-hashed values wherever numpy runs."""
    import numpy as np

    h1 = h_u64 & np.uint64(0xFFFFFFFF)
    h2 = (h_u64 >> np.uint64(32)) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
            for i in range(k)]


def incremental_dedup_bloom(batch: DataFrame, seen: DataFrame,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            n_bits: int = BLOOM_BITS_DEFAULT,
                            n_hashes: int = BLOOM_HASHES) -> DataFrame:
    """incremental_dedup with the Bloom prefilter its docstring promises:
    OUTPUT-IDENTICAL to the exact path (the exact anti join remains the
    verify stage — Bloom false positives only travel to it, never into
    the result), but the batch side that reaches the shuffle shrinks to
    actual-dup candidates + the FP residue.

    Build shape: the curated side's distinct hashes map to k bit
    positions (xxhash64 on the JVM, Kirsch-Mitzenmacher double hashing),
    one map-side-combinable bit_or aggregate per 64-bit word produces a
    SPARSE (word, bits) relation, and only set words are collected
    (bounded by n_bits/64 longs — 512 KiB at the default) and broadcast
    as a numpy bitmap. The batch side tests membership in one Arrow UDF
    over the SAME JVM xxhash64 value (hashed once, engine-side).

    Sizing at scale: n_bits should be ~10 bits per distinct curated hash
    for ~1% FP. The single-bitmap regime tops out around 10^9 curated
    docs (1.2 GiB broadcast); past that, partition the curated set and
    run one bloom pass per partition, or skip the prefilter — the exact
    anti join is always correct without it.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sh = (seen.where(F.col(text_col).isNotNull())
          .select(F.md5(F.col(text_col)).alias("text_hash")).distinct()
          .select("text_hash", F.xxhash64("text_hash").alias("h")))
    pos_exprs = []
    for i in range(n_hashes):
        # JVM-side signed arithmetic replayed on unsigned halves:
        # h1 = low 32 bits, h2 = (high 32 bits) | 1 — both non-negative
        # in int64, so the modulo matches numpy's uint64 result exactly
        pos_exprs.append(
            f"pmod((h & 4294967295L) + {i}L * ((h >> 32) & 4294967295L "
            f"| 1L), {n_bits}L)")
    words = (sh.select(F.explode(F.array(
                 *[F.expr(p) for p in pos_exprs])).alias("pos"))
             .select((F.col("pos") / 64).cast("long").alias("word"),
                     F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")
                     .alias("bit"))
             .groupBy("word")
             .agg(F.expr("bit_or(bit)").alias("bits")))
    rows = words.collect()                       # bounded: <= n_bits/64
    bitmap = np.zeros(n_bits // 64, dtype=np.int64)
    for r in rows:
        bitmap[r["word"]] = r["bits"]
    bitmap_u = bitmap.view(np.uint64)
    sc = batch.sparkSession.sparkContext
    bc = sc.broadcast(bitmap_u)
    nb, k = n_bits, n_hashes

    @pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        bm = bc.value
        arr = h.to_numpy(np.int64).view(np.uint64)
        hit = np.ones(len(arr), dtype=bool)
        for p in _bloom_positions(arr, nb, k):
            w = bm[p >> 6]
            hit &= (w >> (p.astype(np.uint64) & np.uint64(63))
                    & np.uint64(1)).astype(bool)
        return pd.Series(hit)

    bh = (batch.where(F.col(text_col).isNotNull())
          .select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
          .withColumn("h", F.xxhash64("text_hash")))
    # definitely-unseen rows skip the anti join entirely; maybe-seen rows
    # (true dups + FP residue) go through the exact verify
    bh = bh.withColumn("maybe", maybe_seen(F.col("h")))
    fresh_sure = bh.where(~F.col("maybe")).select(id_col, "text_hash")
    candidates = bh.where(F.col("maybe")).select(id_col, "text_hash")
    verified = candidates.join(sh.select("text_hash"),
                               "text_hash", "left_anti")
    fresh = fresh_sure.unionByName(verified)
    return (fresh.groupBy("text_hash")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies"))
            .select("keep_id", "text_hash", "n_copies"))


def duplicated_span_cuts(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", w: int = 16) -> DataFrame:
    """The ACTIONABLE form of duplicated_spans (Lee et al. 2022 step 2):
    per document, the merged token ranges covered by any w-token window
    that also occurs in another document — i.e. exactly what a dedup
    pass would CUT from each document. Returns
    (doc_id, cut_start, cut_end, n_tok) with 1-based inclusive token
    positions; overlapping/adjacent windows coalesce (two dup windows
    whose starts differ by <= w merge into one cut).

    Scale shape: windows travel as (hash, doc, start) id-rows; the
    dup-hash set comes from the same map-side-combinable count-distinct
    aggregate as duplicated_spans, and the membership join reuses the
    hash partitioning the aggregate just produced (no extra exchange on
    AQE). Interval merging is a per-document window function — state
    bounded by document length, never corpus-wide."""
    tk = (f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), "
          f"' ')")
    wins = (f"transform(sequence(1, size({tk}) - {w - 1}), "
            f"i -> named_struct('i', i, 'h', "
            f"md5(array_join(slice({tk}, i, {w}), ' '))))")
    rows = (df.where(F.expr(f"size({tk}) >= {w}"))
            .select(F.col(id_col), F.explode(F.expr(wins)).alias("wn"))
            .select(id_col, F.col("wn.i").alias("start"),
                    F.col("wn.h").alias("span_hash")))
    dup = (rows.groupBy("span_hash")
           .agg(F.countDistinct(id_col).alias("nd"))
           .where(F.col("nd") >= 2)
           .select("span_hash"))
    hit = rows.join(dup, on="span_hash").select(id_col, "start").distinct()
    from pyspark.sql import Window
    ww = Window.partitionBy(id_col).orderBy("start")
    isl = (hit.withColumn(
               "new_cut",
               F.when(F.col("start") - F.lag("start").over(ww) > w, 1)
               .otherwise(0))
           .withColumn("island", F.sum("new_cut").over(ww)))
    return (isl.groupBy(id_col, "island")
            .agg(F.min("start").alias("cut_start"),
                 (F.max("start") + (w - 1)).alias("cut_end"))
            .select(id_col,
                    F.col("cut_start").cast("bigint"),
                    F.col("cut_end").cast("bigint"),
                    (F.col("cut_end") - F.col("cut_start") + 1)
                    .cast("bigint").alias("n_tok")))


def duplicated_span_cuts_duck_sql(w: int = 16, table: str = "dup_docs",
                                  text_col: str = "text",
                                  id_col: str = "doc_id") -> str:
    """DuckDB replay of duplicated_span_cuts (CTE bodies + SELECT, no
    leading WITH; same contract as duplicated_spans_duck_sql)."""
    tk = (f"string_split(trim(regexp_replace(lower({text_col}), "
          f"'\\s+', ' ', 'g')), ' ')")
    return (
        f"sc_t AS (SELECT {id_col}, {tk} AS toks FROM {table}), "
        f"sc_w AS (SELECT {id_col}, unnest(range(1, len(toks) - {w - 2}))"
        f"  AS start, unnest(list_transform(range(1, len(toks) - {w - 2}),"
        f"  i -> md5(array_to_string(toks[i:i+{w - 1}], ' ')))) AS span_hash"
        f"  FROM sc_t WHERE len(toks) >= {w}), "
        f"sc_d AS (SELECT span_hash FROM sc_w GROUP BY span_hash "
        f"  HAVING COUNT(DISTINCT {id_col}) >= 2), "
        f"sc_h AS (SELECT DISTINCT {id_col}, start FROM sc_w "
        f"  WHERE span_hash IN (SELECT span_hash FROM sc_d)), "
        f"sc_i AS (SELECT {id_col}, start, SUM(CASE WHEN prev IS NOT NULL "
        f"  AND start - prev <= {w} THEN 0 ELSE 1 END) OVER ("
        f"  PARTITION BY {id_col} ORDER BY start) AS island FROM ("
        f"  SELECT {id_col}, start, LAG(start) OVER ("
        f"  PARTITION BY {id_col} ORDER BY start) AS prev FROM sc_h)) "
        f"SELECT {id_col}, CAST(MIN(start) AS BIGINT) AS cut_start, "
        f"CAST(MAX(start) + {w - 1} AS BIGINT) AS cut_end, "
        f"CAST(MAX(start) + {w - 1} - MIN(start) + 1 AS BIGINT) AS n_tok "
        f"FROM sc_i GROUP BY {id_col}, island")


def itemset_jaccard_pairs(sets: DataFrame, id_col: str = "id",
                          items_col: str = "s", min_common: int = 2,
                          df_cap: int = BUCKET_CAP,
                          min_jaccard_pct: int = 50) -> DataFrame:
    """Near-dup pairs over ARBITRARY per-entity item sets — the
    entity-level generalization of ngram_jaccard_pairs (same inverted
    index + df-cap pruning + exact verify), decoupled from tokenization
    so the items can be turn-content hashes (conversation dedup),
    attachment digests, cited-URL sets, etc.

    `sets` carries one row per entity: (id, array of DISTINCT items).
    Returns (a, b, common, jacc_pct) exactly as ngram_jaccard_pairs:
    `common` counts shared INDEXED items (item frequency in [2, df_cap]
    — hotter items are stop-pruned, losing only candidate evidence),
    `jacc_pct` is exact over the full sets.

    Scale: the index is a narrow (item, id) relation shuffled on the
    item; per-item pair fan-out is bounded by df_cap^2; the verify join
    ships each entity's item array once per surviving candidate side."""
    sets = _persist_tracked(sets.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(items_col)).alias("s")))
    tok = sets.select("id", F.explode("s").alias("h"))
    keep = (tok.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
            .where((F.col("c") >= 2) & (F.col("c") <= df_cap))
            .select("h"))
    tok2 = tok.join(keep, "h")
    x = tok2.select("h", F.col("id").alias("a"))
    y = tok2.select("h", F.col("id").alias("b"))
    # same no-spread rationale as ngram_jaccard_pairs above
    cand = (x.join(y, "h").where(F.col("a") < F.col("b"))
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))
            .where(F.col("common") >= min_common))
    sa, sb = sets.alias("sa"), sets.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.s"), F.col("sb.s")))
    union = F.size(F.col("sa.s")) + F.size(F.col("sb.s")) - inter
    return (cand.join(sa, F.col("a") == F.col("sa.id"))
            .join(sb, F.col("b") == F.col("sb.id"))
            .select("a", "b", F.col("common").cast("int").alias("common"),
                    F.floor(inter * 100 / union).cast("int")
                    .alias("jacc_pct"))
            .where(F.col("jacc_pct") >= min_jaccard_pct))


def conv_dedup_pairs(transcripts: DataFrame, min_common: int = 2,
                     df_cap: int = BUCKET_CAP,
                     min_jaccard_pct: int = 50) -> DataFrame:
    """Conversation-level near-dup pairs: two conversations are near-
    duplicates when their DISTINCT turn-content hash sets overlap — the
    transcript-corpus analogue of document n-gram dedup (re-imported or
    re-crawled chat logs share most turns verbatim even when a few turns
    differ). Items = md5(turn text); empty/boilerplate turns shared by
    many conversations are stop-pruned by the same df_cap rule that
    kills boilerplate grams.

    One groupBy on conv_id (the table's native key) builds the sets;
    then itemset_jaccard_pairs. At 10^12 turns the set build rides the
    existing conv_id bucketing — the only new shuffle is the narrow
    (hash, conv) inverted index."""
    sets = (transcripts
            .groupBy(F.col("conv_id").alias("id"))
            .agg(F.collect_set(F.md5(F.coalesce(F.col("text"), F.lit(""))))
                 .alias("s")))
    return itemset_jaccard_pairs(sets, min_common=min_common,
                                 df_cap=df_cap,
                                 min_jaccard_pct=min_jaccard_pct)


def soft_dedup_weights(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """SOFT dedup: keep every copy but down-weight it — the
    data-constrained-training recipe (train on all k copies at weight
    1/k so the group contributes one document's worth of gradient)
    used when dropping duplicates would shrink the corpus below the
    token budget. Returns every row with its exact-dup group size and
    the integer training weight 10^6 DIV k ppm.

    Shape: ONE shuffle on the text hash (a window count over the hash
    partition — no join-back, the group size is attached in the same
    exchange the grouping itself needs). Weight is integer ppm so the
    downstream sampler can stay engine-exact."""
    w = Window.partitionBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))))
    return (df.select(
        id_col,
        F.count(F.lit(1)).over(w).alias("dup_count"))
        .select(id_col, F.col("dup_count").cast("bigint").alias("dup_count"),
                F.expr("CAST(1000000 DIV dup_count AS BIGINT)")
                .alias("weight_ppm")))
