"""SparkSession factory.

Mirrors the reference's engine bootstrap (Polars/DuckDB in-process init,
assignment1.ipynb cell b4b10c52) as a single configured SparkSession:

- AQE on: runtime coalescing of the tiny post-agg shuffles this surface
  produces, skew-join splitting at scale.
- Arrow on: the chart-contract `toPandas()` handoff (SURVEY §2.1 S6) is
  columnar, like the reference's Polars->Arrow->DuckDB zero-copy path.
- Session timezone pinned UTC: the reference's timestamps are tz-naive
  (TLC parquet); DuckDB-oracle comparison requires identical wall-clock
  interpretation of `hour()` / day-name extraction.
- shuffle.partitions sized to local cores, not the 200 default; on a real
  cluster this is overridden per-deploy (AQE coalesces either way).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    `master`/`shuffle_partitions` default from $SPARK_GRAFT_CPUS so the
    driver's bench harness controls parallelism without code changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Driver testdata stores events.ts as parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; read as long and let
        # io.read_table convert to microsecond timestamps (matching
        # DuckDB's own ns->us truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Write timestamps as TIMESTAMP_MICROS (not legacy INT96): INT96
        # columns carry no parquet min/max footer stats, which silently
        # disables row-group pruning on every ts-range predicate over
        # data we write — the core scan-efficiency lever of
        # io.write_sorted at 100 TB.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
