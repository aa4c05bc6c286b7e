"""Text-analysis operators for training-data pipelines (SQL-first).

Everything here is whole-stage-codegen SQL except heuristic language-ID,
which reuses the langid kernels. Token counting uses a whitespace split plus
a BPE-ish regex token count; fingerprinting is a normalized md5 (and the
rolling SimHash lives in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# BPE-ish word/number/punct tokens (portable across Java regex / RE2 / re)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.trim(F.col(text_col))
    ws_tokens = F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))
    pat = BPE_TOKEN_PATTERN.replace("\\", "\\\\")
    bpe_count = F.expr(f"size(regexp_extract_all(trim({text_col}), '{pat}', 0))")
    return (df
            .withColumn("n_ws_tokens", ws_tokens)
            .withColumn("n_bpe_tokens", bpe_count)
            .withColumn("fingerprint", F.md5(F.lower(t))))


def lang_distribution(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language histogram via the langid UDF: one Python stage, then a
    map-side-combinable groupBy (partial agg before the single shuffle)."""
    from cld2_spark.functions.langid import detect_udf

    return (df.select(detect_udf(F.col(text_col)).alias("lang"))
            .groupBy("lang").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n")))


def with_split(df: DataFrame, id_col: str = "doc_id",
               train_pct: int = 80, val_pct: int = 10,
               salt: str = "cld2s") -> DataFrame:
    """Deterministic train/val/test assignment by salted id hash.

    The split is a pure function of (salt, id): stable across runs,
    machines and partitionings -- the property a 100TB training-data
    split needs (no sampling state, no shuffle; assignment is a codegen
    projection). Changing the salt redraws the split; keeping it
    guarantees a document never migrates between splits as the corpus
    grows (the basis of leakage-free incremental training sets).
    """
    bucket = F.expr(
        f"conv(substring(md5(concat('{salt}', CAST({id_col} AS STRING))), "
        f"1, 8), 16, 10) % 100").cast("int")
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"))


def quality_rank_filter(df: DataFrame, pct: float = 0.25,
                        group_col: str = "source",
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Adaptive per-group quality floor: drop each group's bottom `pct`
    by lexical-diversity score (distinct tokens / tokens — the cheapest
    repetition-robust quality proxy), keeping docs with
    percent_rank >= pct within their group.

    Rank-based on purpose: the score is a ratio of small exact integers
    and percent_rank is (rank-1)/(n-1) on those, so the whole filter is
    engine-exact — no percentile-interpolation float boundary to flip a
    doc between engines. This exact path costs one sort per group (the
    group key bounds the shuffle); at 100 TB with billion-row groups,
    swap the cutoff computation for operators.quantiles.grouped_quantiles
    (exact=False, mergeable GK sketch) and broadcast the per-group
    cutoffs instead — same API shape, documented trade in BENCH/BASELINE.md.
    """
    from pyspark.sql import Window

    tk = ("split(trim(regexp_replace(lower({c}), '\\\\s+', ' ')), ' ')"
          .format(c=text_col))
    score = F.expr(f"size(array_distinct({tk})) / size({tk})")
    w = Window.partitionBy(group_col).orderBy("score")
    return (df.select(id_col, group_col, score.alias("score"))
            .withColumn("pr", F.percent_rank().over(w))
            .where(F.col("pr") >= pct)
            .select(id_col, group_col, F.round("score", 6).alias("score"),
                    F.round("pr", 6).alias("pr")))
