"""Checkpoint/resume: kill mid-run, resume, verify idempotent completion."""

import pytest

from cld2_spark.pipeline.run import load_manifest, run_resumable
from cld2_spark.sources.transcripts import synth_transcripts_pandas


def test_resume_after_injected_failure(spark, tmp_path):
    out = str(tmp_path / "out")
    pdf = synth_transcripts_pandas(800)
    df = spark.createDataFrame(pdf)

    # first run dies after 4 of 8 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(spark, df, out, n_buckets=8, buckets_per_commit=4,
                      fail_after_buckets=4)
    m1 = load_manifest(out)
    assert len(m1["completed_buckets"]) == 4

    # resume completes the remainder without reprocessing finished buckets
    m2 = run_resumable(spark, df, out, n_buckets=8, buckets_per_commit=4)
    assert len(m2["completed_buckets"]) == 8

    result = spark.read.parquet(f"{out}/data")
    assert result.count() == 800
    # exactly one verdict per (conv_id, turn_idx): idempotent overwrite
    dupes = (result.groupBy("conv_id", "turn_idx").count()
             .where("count > 1").count())
    assert dupes == 0

    # lineage metrics sidecar aggregates to the full row count
    import json
    metrics = json.loads((tmp_path / "out" / "_cld2s_metrics.json").read_text())
    assert metrics["n_turns"] == 800
    assert metrics["n_keep"] + sum(
        metrics[f"n_{r}"] for r in ["too_short", "langid_unreliable",
                                    "low_quality", "high_perplexity", "toxicity"]
    ) == 800


def test_rerun_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "out2")
    df = spark.createDataFrame(synth_transcripts_pandas(200))
    run_resumable(spark, df, out, n_buckets=4, buckets_per_commit=2)
    n1 = spark.read.parquet(f"{out}/data").count()
    # a second full run over the same manifest is a no-op
    m = run_resumable(spark, df, out, n_buckets=4, buckets_per_commit=2)
    assert len(m["completed_buckets"]) == 4
    assert spark.read.parquet(f"{out}/data").count() == n1 == 200


def test_write_bucketed_direct_call_preserves_other_buckets(spark, tmp_path):
    """ADVICE r2 #4: write_bucketed sets dynamic partition overwrite on the
    writer itself -- a direct call under the session default (static) must
    not wipe previously written bucket partitions."""
    from pathlib import Path
    from cld2_spark.pipeline.sink import write_bucketed
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    d = str(tmp_path / "sink")
    a = spark.createDataFrame([("c1", 0, 0)], "conv_id string, turn_idx int, bucket int")
    b = spark.createDataFrame([("c2", 0, 1)], "conv_id string, turn_idx int, bucket int")
    try:
        write_bucketed(a, d)
        write_bucketed(b, d)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    kept = {p.name for p in Path(d, "data").iterdir() if p.name.startswith("bucket=")}
    assert kept == {"bucket=0", "bucket=1"}
