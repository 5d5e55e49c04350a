"""SparkSession factory.

Local test harness runs on local[N] (single JVM). The config choices below are the
ones that also matter on a real 1000-executor cluster at 100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting) — this is the
  batch-side analogue of the reference's runtime adaptivity (SURVEY.md §4).
- shuffle.partitions sized to the parallelism at hand. At cluster scale this would
  be ~2-3x total cores (or left to AQE's coalescing with a high initial value).
- Arrow enabled so the Pandas-UDF slow path is at least vectorized.
- UTC session timezone so timestamp semantics match the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "flink_adcom_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session. Idempotent: getOrCreate reuses the live JVM."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the synthetic events table stores TIMESTAMP(NANOS) which the Spark
        # parquet reader rejects; read as long and convert (tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
