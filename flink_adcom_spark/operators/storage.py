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
