"""Skew handling: a mega-conversation must not pin one task."""

from pyspark.sql import functions as F

from cld2_spark.pipeline.stages import partition_for_scale, run_pipeline
from cld2_spark.sources.transcripts import spark_transcripts


def test_mega_conversation_is_salted_across_partitions(spark):
    # one conversation with 50x the median turn count
    df = spark_transcripts(spark, n_turns=400, mega_turns=1000)
    salted = partition_for_scale(df, n_partitions=8, salt_buckets=8)
    dist = (salted.withColumn("pid", F.spark_partition_id())
            .where(F.col("conv_id") == "mega")
            .groupBy("pid").count().toPandas())
    # the mega conversation's 1000 turns land on several partitions
    assert len(dist) >= 4, dist
    assert dist["count"].max() < 1000


def test_pipeline_correct_under_salting(spark):
    """Salting must not change per-turn results (row-local pipeline)."""
    df = spark_transcripts(spark, n_turns=300, mega_turns=200)
    plain = (run_pipeline(df).toPandas()
             .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    salted = (run_pipeline(partition_for_scale(df, 8)).toPandas()
              .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert (plain["keep"].to_numpy() == salted["keep"].to_numpy()).all()
    assert (plain["scrubbed_text"].to_numpy() == salted["scrubbed_text"].to_numpy()).all()
