"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship quality-filter pipeline over a
transcripts-shaped view of sf0.001. `queries()` exposes one callable per
implemented operator (SURVEY.md §2 + training-data ops); `oracle_sql()`
gives the DuckDB-equivalent SQL for every SQL-expressible one (langid and
the full keep/drop pipeline are UDF-based -> rows-only checks by design,
SURVEY.md Appendix A).

Column names are aliased identically on both sides; floats are rounded;
timestamps are avoided in compared outputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# documents ++ a deterministic duplicated third -> dedup queries have real work
DUP_DOCS_SQL = ("SELECT doc_id, text FROM documents "
                "UNION ALL "
                "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
                "WHERE doc_id % 3 = 0")

_SHINGLE_SPARK = ("transform(sequence(1, greatest(length(text) - 4, 1)), "
                  "i -> substring(text, i, 5))")
_SHINGLE_DUCK = ("list_transform(range(1, greatest(length(text) - 3, 2)), "
                 "i -> substr(text, CAST(i AS INT), 5))")

N_BANDS = 4


def _register(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver tables + derived views as temp views (idempotent)."""
    from cld2_spark.sources.transcripts import transcripts_view_sql

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    spark.sql(transcripts_view_sql("spark", "documents")) \
        .createOrReplaceTempView("transcripts")
    spark.sql(DUP_DOCS_SQL).createOrReplaceTempView("dup_docs")


def _lsh_buckets_duck_sql() -> str:
    from cld2_spark.operators.similarity import _planes_literal
    cols = []
    for t in range(3):
        planes = _planes_literal(64, 6, seed=42 + t)
        bits = []
        for i, p in enumerate(planes):
            arr = "[" + ", ".join(f"{x}" for x in p) + "]"
            dot = (f"list_sum(list_transform(list_zip(embedding, {arr}), "
                   f"z -> CAST(z[1] AS DOUBLE) * z[2]))")
            bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
        cols.append("(" + " + ".join(bits) + f") AS bucket{t}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


def _duck_ctes() -> str:
    """Shared DuckDB CTE prelude mirroring the Spark temp views."""
    from cld2_spark.sources.transcripts import transcripts_view_sql

    return (f"WITH transcripts AS ({transcripts_view_sql('duckdb', 'documents')}), "
            f"dup_docs AS ({DUP_DOCS_SQL})")


# ---------------------------------------------------------------- queries ----

def _q_scrub_pii(spark, sf_dir):
    from cld2_spark.kernels.scrub import scrub_spark_columns
    _register(spark, sf_dir)
    df = scrub_spark_columns(spark.table("transcripts"), "text", "scrubbed_text")
    return df.select("conv_id", "turn_idx", "scrubbed_text")


def _q_quality_flags(spark, sf_dir):
    from cld2_spark.kernels.quality import low_quality_sql, too_short_sql
    _register(spark, sf_dir)
    return spark.sql(
        f"SELECT conv_id, turn_idx, "
        f"{too_short_sql('text', 'spark')} AS too_short, "
        f"{low_quality_sql('text', 'spark')} AS low_quality "
        f"FROM transcripts")


def _q_toxicity(spark, sf_dir):
    from cld2_spark.kernels.scrub import toxicity_sql
    _register(spark, sf_dir)
    return spark.sql(
        f"SELECT conv_id, turn_idx, {toxicity_sql('text', 'spark')} AS toxic "
        f"FROM transcripts")


def _q_turn_window(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT conv_id, turn_idx, "
        "ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn, "
        "COALESCE(LAG(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx), -1) AS prev_len "
        "FROM transcripts")


def _q_conv_rollup(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT conv_id, COUNT(*) AS n_turns, "
        "SUM(length(text)) AS total_chars, "
        "SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user_turns "
        "FROM transcripts GROUP BY conv_id")


def _q_pricing_summary(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, "
        "SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus")


def _q_top_customers(spark, sf_dir):
    _register(spark, sf_dir)
    # broadcast the small dim explicitly (J8 analogue / SURVEY §2.3)
    from pyspark.sql import functions as F
    orders = spark.table("orders")
    customer = spark.table("customer")
    rev = (orders.groupBy("o_custkey")
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    joined = rev.join(F.broadcast(customer),
                      rev.o_custkey == customer.c_custkey)
    from pyspark.sql.window import Window
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("revenue"), F.asc("c_custkey"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("c_mktsegment", "c_custkey", "revenue", "rank"))


def _q_dedup_exact(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, "
        "COUNT(*) AS n_copies FROM dup_docs GROUP BY md5(text)")


def _band_exprs_spark():
    """LSH bands of r=3 minhashes each: collision prob = J**3 per band, so
    vocabulary-overlap noise (J~0.2) stays out of the candidate set while
    true near-dups (J~1) collide with prob ~1 per band."""
    out = []
    for b in range(N_BANDS):
        mins = ", ".join(
            f"array_min(transform(shingles, s -> md5(concat('{3 * b + r}_', s))))"
            for r in range(3))
        out.append(f"md5(concat_ws('|', {mins})) AS band{b}")
    return ", ".join(out)


def _band_exprs_duck():
    out = []
    for b in range(N_BANDS):
        mins = " || '|' || ".join(
            f"list_aggregate(list_transform(shingles, s -> md5('{3 * b + r}_' || s)), 'min')"
            for r in range(3))
        out.append(f"md5({mins}) AS band{b}")
    return ", ".join(out)


def _q_minhash_signatures(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        f"SELECT doc_id, {_band_exprs_spark()} FROM "
        f"(SELECT doc_id, {_SHINGLE_SPARK} AS shingles FROM dup_docs "
        f" WHERE length(text) >= 5)")


def _q_minhash_pairs(spark, sf_dir):
    """LSH banding: candidate id-pairs sharing any band signature, then one
    join back to the shingle sets for exact Jaccard verification. Ids-only
    through the band self-join (no arrays in the shuffle)."""
    _register(spark, sf_dir)
    spark.sql(
        f"SELECT doc_id, {_band_exprs_spark()} FROM "
        f"(SELECT doc_id, {_SHINGLE_SPARK} AS shingles FROM dup_docs "
        f" WHERE length(text) >= 5)").createOrReplaceTempView("mh_sigs")
    band_union = " UNION ALL ".join(
        f"SELECT band{b} AS band_key, doc_id FROM mh_sigs" for b in range(N_BANDS))
    spark.sql(
        f"SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
        f"FROM ({band_union}) x JOIN ({band_union}) y "
        f"ON x.band_key = y.band_key AND x.doc_id < y.doc_id"
    ).createOrReplaceTempView("mh_cand")
    spark.sql(
        f"SELECT doc_id, array_distinct({_SHINGLE_SPARK}) AS st FROM dup_docs "
        f"WHERE length(text) >= 5").createOrReplaceTempView("mh_sets")
    return spark.sql(
        "SELECT a, b, jacc_pct FROM ("
        "  SELECT a, b, CAST(FLOOR(size(array_intersect(sa.st, sb.st)) * 100 / "
        "       (size(sa.st) + size(sb.st) - size(array_intersect(sa.st, sb.st)))) AS INT) AS jacc_pct "
        "  FROM mh_cand JOIN mh_sets sa ON mh_cand.a = sa.doc_id "
        "  JOIN mh_sets sb ON mh_cand.b = sb.doc_id"
        ") WHERE jacc_pct >= 50")


def _q_token_stats(spark, sf_dir):
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT doc_id, "
        "size(split(trim(text), '\\\\s+')) AS n_tokens, "
        "size(array_distinct(split(trim(text), '\\\\s+'))) AS n_distinct_tokens, "
        "md5(lower(trim(text))) AS fingerprint "
        "FROM documents WHERE length(trim(text)) > 0")


def _q_ann_cosine(spark, sf_dir):
    """Brute-force cosine similarity join: query vecs (vec_id < 10) vs all,
    thresholded. The scale path buckets by LSH sign bits (operators/similarity)."""
    _register(spark, sf_dir)
    dot = ("aggregate(zip_with(q.embedding, e.embedding, "
           "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    qn = ("sqrt(aggregate(q.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    en = ("sqrt(aggregate(e.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    return spark.sql(
        f"SELECT q.vec_id AS qid, e.vec_id AS nid, "
        f"ROUND({dot} / ({qn} * {en}), 4) AS sim "
        f"FROM (SELECT * FROM embeddings WHERE vec_id < 10) q "
        f"CROSS JOIN embeddings e "
        f"WHERE e.vec_id != q.vec_id "
        f"  AND {dot} / ({qn} * {en}) > 0.3")


def _q_events_windowed(spark, sf_dir):
    """Tumbling-window aggregation over the events stream table (the batch
    equivalent of the streaming windowed agg, SURVEY.md §2.9)."""
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT unix_timestamp(date_trunc('hour', ts)) AS window_start, "
        "event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
        "FROM events GROUP BY 1, 2")


def _q_brand_revenue(spark, sf_dir):
    """lineitem JOIN part with a selective filter -- predicate/column
    pushdown reaches the parquet scan (verified in tests/test_plans.py)."""
    _register(spark, sf_dir)
    from pyspark.sql import functions as F
    li = spark.table("lineitem").where(F.col("l_quantity") > 30)
    part = spark.table("part")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


def _q_priority_semijoin(spark, sf_dir):
    """Semi join (EXISTS): orders with a discounted line, counted per
    priority (TPC-H Q4 shape); plus the anti-join complement count."""
    _register(spark, sf_dir)
    return spark.sql(
        "SELECT o_orderpriority, "
        "SUM(CASE WHEN EXISTS (SELECT 1 FROM lineitem l "
        "    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) "
        "    THEN 1 ELSE 0 END) AS with_discounted_line, "
        "SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM lineitem l "
        "    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) "
        "    THEN 1 ELSE 0 END) AS without_discounted_line "
        "FROM orders o GROUP BY o_orderpriority")


def _q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs (vectorized rolling-hash UDF -> rows-only)."""
    from cld2_spark.operators.dedup import simhash_pairs
    _register(spark, sf_dir)
    return simhash_pairs(spark.table("dup_docs"), max_hamming=3)


def _q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate cosine top-k (scale path; rows-only)."""
    from pyspark.sql import functions as F
    from cld2_spark.operators.similarity import lsh_cosine_topk
    _register(spark, sf_dir)
    emb = spark.table("embeddings")
    return lsh_cosine_topk(emb, emb.where(F.col("vec_id") < 10), k=5, dim=64)


def _q_lang_histogram(spark, sf_dir):
    """Language distribution over transcripts (langid UDF + groupBy)."""
    from cld2_spark.operators.textstats import lang_distribution
    _register(spark, sf_dir)
    return lang_distribution(spark.table("transcripts"))


def _q_lsh_buckets(spark, sf_dir):
    """Sign-bit LSH bucket ids per embedding (the ANN scale path's bucketing,
    deterministic hyperplanes) -- oracle-checkable in DuckDB."""
    from cld2_spark.operators.similarity import _planes_literal, lsh_bucket_expr
    _register(spark, sf_dir)
    cols = []
    for t in range(3):
        planes = _planes_literal(64, 6, seed=42 + t)
        cols.append(f"{lsh_bucket_expr('embedding', planes)} AS bucket{t}")
    return spark.sql(f"SELECT vec_id, {', '.join(cols)} FROM embeddings")


def _q_conversation_features(spark, sf_dir):
    """Grouped-map pandas UDF (applyInPandas): per-conversation ordered
    stats; oracle = equivalent window SQL in DuckDB."""
    from cld2_spark.pipeline.conversation import conversation_features
    _register(spark, sf_dir)
    return conversation_features(spark.table("transcripts"))


def _q_langid(spark, sf_dir):
    """CLD2-style langid over transcripts (UDF -> rows-only driver check)."""
    from pyspark.sql import functions as F
    from cld2_spark.functions.langid import detect_summary_udf
    _register(spark, sf_dir)
    df = spark.table("transcripts")
    return (df.withColumn("ld", detect_summary_udf(F.col("text")))
            .select("conv_id", "turn_idx",
                    F.col("ld.lang1").alias("lang1"),
                    F.col("ld.pct1").alias("pct1"),
                    F.col("ld.is_reliable").alias("is_reliable")))


def _q_keep_drop(spark, sf_dir):
    """Full quality-filter pipeline (UDF -> rows-only driver check)."""
    from cld2_spark.pipeline.stages import run_pipeline
    _register(spark, sf_dir)
    return run_pipeline(spark.table("transcripts"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q_keep_drop(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scrub_pii": _q_scrub_pii,
        "quality_flags": _q_quality_flags,
        "toxicity": _q_toxicity,
        "turn_window": _q_turn_window,
        "conv_rollup": _q_conv_rollup,
        "pricing_summary": _q_pricing_summary,
        "top_customers": _q_top_customers,
        "dedup_exact": _q_dedup_exact,
        "minhash_signatures": _q_minhash_signatures,
        "minhash_pairs": _q_minhash_pairs,
        "token_stats": _q_token_stats,
        "ann_cosine": _q_ann_cosine,
        "events_windowed": _q_events_windowed,
        "brand_revenue": _q_brand_revenue,
        "priority_semijoin": _q_priority_semijoin,
        "dedup_simhash": _q_dedup_simhash,
        "ann_lsh": _q_ann_lsh,
        "lsh_buckets": _q_lsh_buckets,
        "lang_histogram": _q_lang_histogram,
        "conversation_features": _q_conversation_features,
        "langid": _q_langid,
        "keep_drop": _q_keep_drop,
    }


def oracle_sql() -> dict[str, str]:
    from cld2_spark.kernels.quality import low_quality_sql, too_short_sql
    from cld2_spark.kernels.scrub import scrub_sql, toxicity_sql

    ctes = _duck_ctes()
    mh_sigs = (f"mh_sigs AS (SELECT doc_id, {_band_exprs_duck()} FROM "
               f"(SELECT doc_id, {_SHINGLE_DUCK} AS shingles FROM dup_docs "
               f" WHERE length(text) >= 5))")
    band_union = " UNION ALL ".join(
        f"SELECT band{b} AS band_key, doc_id FROM mh_sigs" for b in range(N_BANDS))
    mh_cand = (f"mh_cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b "
               f"FROM ({band_union}) x JOIN ({band_union}) y "
               f"ON x.band_key = y.band_key AND x.doc_id < y.doc_id)")
    mh_sets = (f"mh_sets AS (SELECT doc_id, list_distinct({_SHINGLE_DUCK}) AS st "
               f"FROM dup_docs WHERE length(text) >= 5)")

    dot = ("list_sum(list_transform(list_zip(q.embedding, e.embedding), "
           "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))")
    qn = "sqrt(list_sum(list_transform(q.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    en = "sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"

    return {
        "scrub_pii": (
            f"{ctes} SELECT conv_id, turn_idx, "
            f"{scrub_sql('text', 'duckdb')} AS scrubbed_text FROM transcripts"),
        "quality_flags": (
            f"{ctes} SELECT conv_id, turn_idx, "
            f"{too_short_sql('text', 'duckdb')} AS too_short, "
            f"{low_quality_sql('text', 'duckdb')} AS low_quality FROM transcripts"),
        "toxicity": (
            f"{ctes} SELECT conv_id, turn_idx, "
            f"{toxicity_sql('text', 'duckdb')} AS toxic FROM transcripts"),
        "turn_window": (
            f"{ctes} SELECT conv_id, turn_idx, "
            f"ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn, "
            f"COALESCE(LAG(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx), -1) AS prev_len "
            f"FROM transcripts"),
        "conv_rollup": (
            f"{ctes} SELECT conv_id, COUNT(*) AS n_turns, "
            f"SUM(length(text)) AS total_chars, "
            f"SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user_turns "
            f"FROM transcripts GROUP BY conv_id"),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "SUM(l_quantity) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"),
        "top_customers": (
            "SELECT c_mktsegment, c_custkey, revenue, rank FROM ("
            "  SELECT c.c_mktsegment, c.c_custkey, r.revenue, "
            "  ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment "
            "                     ORDER BY r.revenue DESC, c.c_custkey ASC) AS rank "
            "  FROM (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS revenue "
            "        FROM orders GROUP BY o_custkey) r "
            "  JOIN customer c ON r.o_custkey = c.c_custkey"
            ") WHERE rank <= 5"),
        "dedup_exact": (
            f"{ctes} SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, "
            f"COUNT(*) AS n_copies FROM dup_docs GROUP BY md5(text)"),
        "minhash_signatures": (
            f"{ctes}, {mh_sigs} SELECT doc_id, band0, band1, band2, band3 FROM mh_sigs"),
        "minhash_pairs": (
            f"{ctes}, {mh_sigs}, {mh_cand}, {mh_sets} "
            f"SELECT a, b, jacc_pct FROM ("
            f"  SELECT a, b, CAST(FLOOR(len(list_intersect(sa.st, sb.st)) * 100 / "
            f"       (len(sa.st) + len(sb.st) - len(list_intersect(sa.st, sb.st)))) AS INT) AS jacc_pct "
            f"  FROM mh_cand JOIN mh_sets sa ON mh_cand.a = sa.doc_id "
            f"  JOIN mh_sets sb ON mh_cand.b = sb.doc_id"
            f") WHERE jacc_pct >= 50"),
        "token_stats": (
            "SELECT doc_id, "
            "length(string_split_regex(trim(text), '\\s+')) AS n_tokens, "
            "length(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens, "
            "md5(lower(trim(text))) AS fingerprint "
            "FROM documents WHERE length(trim(text)) > 0"),
        "ann_cosine": (
            f"SELECT q.vec_id AS qid, e.vec_id AS nid, "
            f"ROUND({dot} / ({qn} * {en}), 4) AS sim "
            f"FROM (SELECT * FROM embeddings WHERE vec_id < 10) q "
            f"CROSS JOIN embeddings e "
            f"WHERE e.vec_id != q.vec_id "
            f"  AND {dot} / ({qn} * {en}) > 0.3"),
        "events_windowed": (
            "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start, "
            "event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"),
        "brand_revenue": (
            "SELECT p_brand, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "COUNT(*) AS n_lines "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_quantity > 30 GROUP BY p_brand"),
        "priority_semijoin": (
            "SELECT o_orderpriority, "
            "SUM(CASE WHEN EXISTS (SELECT 1 FROM lineitem l "
            "    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) "
            "    THEN 1 ELSE 0 END) AS with_discounted_line, "
            "SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM lineitem l "
            "    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05) "
            "    THEN 1 ELSE 0 END) AS without_discounted_line "
            "FROM orders o GROUP BY o_orderpriority"),
        "lsh_buckets": _lsh_buckets_duck_sql(),
        "conversation_features": (
            f"{ctes}, g AS (SELECT conv_id, turn_idx, role, text, ts, "
            f"  epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx)) AS gap "
            f"  FROM transcripts) "
            f"SELECT conv_id, CAST(COUNT(*) AS INT) AS n_turns, "
            f"CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS INT) AS n_user_turns, "
            f"SUM(length(COALESCE(text, ''))) AS total_chars, "
            f"COALESCE(ROUND(AVG(gap), 3), 0.0) AS mean_gap_s, "
            f"COALESCE(ROUND(MAX(gap), 3), 0.0) AS max_gap_s "
            f"FROM g GROUP BY conv_id"),
        # langid / keep_drop / dedup_simhash / ann_lsh / lang_histogram:
        # UDF pipelines, not SQL-expressible -> rows-only checks by design
    }
