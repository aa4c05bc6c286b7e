"""Output sink: Iceberg table when a catalog is configured, parquet layout
with identical partitioning otherwise.

The north rule targets Iceberg tables. This container has no Iceberg
runtime jar, so the sink is selected at runtime: if the session has an
Iceberg catalog configured (spark.sql.catalog.<name> =
org.apache.iceberg.spark.SparkCatalog), `write_bucketed` uses the
DataFrameWriterV2 path -- `df.writeTo(table).overwritePartitions()` --
which maps one-to-one onto the parquet fallback used here:

  parquet dynamic-partition-overwrite on `bucket`  <->  Iceberg
  overwritePartitions() on a table partitioned by `bucket` (the conv_id
  hash bucket doubles as the Iceberg partition transform), with the
  manifest keyed on the snapshot id the commit returns.

Both paths are idempotent per bucket group, which is what the resume
manifest (pipeline/run.py) relies on.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

BUCKET_COL = "bucket"


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None."""
    try:
        all_conf = spark.sparkContext.getConf().getAll()
    except Exception:
        return None
    for k, v in all_conf:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 \
                and "iceberg" in str(v).lower():
            return k.rsplit(".", 1)[1]
    return None


def write_bucketed(df: DataFrame, output_dir: str,
                   table: str | None = None) -> None:
    """Write one bucket group: Iceberg overwritePartitions when `table`
    names an Iceberg table in a configured catalog, else parquet with
    dynamic partition overwrite (identical per-bucket idempotency)."""
    spark = df.sparkSession
    sorted_df = (df.repartition(BUCKET_COL)
                 .sortWithinPartitions("conv_id", "turn_idx"))
    if table is not None and iceberg_catalog(spark) is not None:
        from pyspark.sql import functions as F
        if not spark.catalog.tableExists(table):
            (sorted_df.writeTo(table)
             .partitionedBy(F.col(BUCKET_COL))
             .createOrReplace())
        else:
            sorted_df.writeTo(table).overwritePartitions()
        return
    # dynamic overwrite is set on the writer itself (ADVICE r2 #4): a
    # direct call under the default static mode would wipe every
    # previously-written bucket partition, breaking per-bucket idempotency
    (sorted_df.write.partitionBy(BUCKET_COL).mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .parquet(str(Path(output_dir) / "data")))
