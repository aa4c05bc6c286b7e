"""Structured Streaming wrapper for the quality-filter pipeline.

The per-turn pipeline is stateless (SURVEY.md §2.9), so streaming = the same
row-local transformation chain under readStream, plus a watermark for late
arrivals and foreachBatch for transactional sinks:

    readStream(transcripts) -> withWatermark(ts) -> run_pipeline -> sink

Conversation-level aggregates (if ever needed) would use windowed groupBy
under the same watermark; no custom stateful operator is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cld2_spark.pipeline.stages import run_pipeline

TRANSCRIPT_DDL = ("conv_id string, turn_idx int, role string, text string, "
                  "tool string, ts timestamp")


def stream_transcripts(spark: SparkSession, source_dir: str,
                       watermark: str = "10 minutes") -> DataFrame:
    """File-source stream of transcript parquet with late-data watermark."""
    return (spark.readStream.schema(TRANSCRIPT_DDL).parquet(source_dir)
            .withWatermark("ts", watermark))


def start_pipeline_stream(spark: SparkSession, source_dir: str, sink_dir: str,
                          checkpoint_dir: str, trigger_once: bool = True):
    """Run the full pipeline as a stream; parquet sink via foreachBatch
    (swap the write for `writeTo(...).append()` on an Iceberg catalog)."""
    src = stream_transcripts(spark, source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        run_pipeline(batch_df).write.mode("append").parquet(sink_dir)

    writer = (src.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
