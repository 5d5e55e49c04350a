"""Storage-layout operators: partitioned and bucketed writes.

At 100 TB the dominant cost of repeated joins/aggregations is the shuffle;
the storage layout is how you pay it once:

- `write_partitioned`: hive-style directory partitioning — partition pruning
  turns predicates on the partition column into directory skips (no IO at
  all for excluded partitions).
- `write_bucketed`: co-locate both sides of a recurring equi-join by bucket
  on the join key; subsequent joins on that key plan with ZERO exchanges
  (asserted in tests/test_storage.py). This is the Spark-native answer to
  the reference's hand-placed partitioners (SURVEY.md X2/X3): the layout,
  not the operator code, carries the partitioning contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table. Joins and
    aggregations on bucket_cols then need no exchange (and no sort, if
    sorted)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner") -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on, how)


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    out_path: str | None = None,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files and return the new
    file count.

    The small-files problem is the dual of the shuffle problem at 100 TB: a
    streaming sink committing per-trigger leaves thousands of KB-sized files
    whose open/footer cost dominates later scans. Compaction = read + write
    with the output partition count derived from the dataset's actual bytes.
    Uses repartition (round-robin) for even sizes; runs per-partition-dir in
    production so only closed partitions rewrite."""
    import math

    # size via the Hadoop FileSystem API, NOT os.walk: the path may be
    # s3a://, hdfs://, or driver-remote — a local-filesystem walk would
    # silently measure 0 bytes there and funnel the whole dataset through
    # repartition(1)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if out_path is None:
        # cannot lazily read and overwrite the same path: write aside, then
        # swap via two renames. The crash window leaves EITHER the original
        # intact (before the first rename) OR the dataset parked at
        # <path>__precompact + the compacted copy at <path>__compacting —
        # recoverable by a rename, never destroyed (the previous
        # rmtree-then-replace order had a window with NO copy at all).
        # Readers racing the swap can still glimpse a missing path: at
        # production scale do this per closed partition, or swap a
        # metastore/table pointer instead of the directory.
        tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting")
        old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__precompact")
        df.repartition(n_files).write.mode("overwrite").parquet(tmp.toString())
        if not fs.rename(hpath, old):
            raise IOError(f"compact: could not park {path} at {old}")
        if not fs.rename(tmp, hpath):
            fs.rename(old, hpath)  # roll back
            raise IOError(f"compact: could not move {tmp} into place; rolled back")
        fs.delete(old, True)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def upsert_partitions(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Overwrite ONLY the hive partitions present in `df`, leaving all other
    partitions untouched (dynamic partition overwrite) — the idempotent
    re-ingest primitive: replaying one day/hour replaces exactly that
    day/hour. With static overwrite (the default) the same write would drop
    the whole dataset."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
