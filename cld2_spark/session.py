"""SparkSession factory with scale-oriented defaults.

Configs chosen for the 100TB design point (SURVEY.md §4):
  - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
  - Arrow-batched Python UDFs with a bounded batch size (the hit-buffer
    analogue: bound per-batch memory, since turns vary in length)
  - shuffle partition count from the environment (a real cluster submits
    with --conf; local tests size it to cores)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "cld2_spark", cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, int(os.environ.get("CLD2S_SHUFFLE_PARTITIONS", cores)))
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("CLD2S_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
