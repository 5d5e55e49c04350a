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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


# --- Z-order (interleaved-bit) multi-dimensional clustering ---------------------
Z_BITS = 16  # per-dimension resolution; 2 dims -> a 32-bit z key


def zorder_key(cols: list[str], mins: list[float], maxs: list[float]) -> Column:
    """Interleaved-bit Morton key over 2+ numeric columns, each equi-width
    scaled against its (min, max). Pure scan-side integer expressions
    (shift/or over longs, whole-stage codegen) — the same key Delta/Iceberg
    compute for their OPTIMIZE ZORDER BY.

    Per-dimension resolution is min(Z_BITS, 62 // n_dims) so the interleaved
    index never reaches the long's sign bit (bit 63) — at Z_BITS=16 a 4th
    column would otherwise set the sign bit and INVERT the range order for
    half the rows, and 5+ columns would alias shifts mod 64 (Java shift
    semantics) and scramble the key entirely. NULLs in a clustered column
    quantize to bucket 0 (explicitly, via the isNull guard — Spark's
    greatest/least would otherwise silently send them to the MAX bucket)."""
    if len(cols) < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:
            raise ValueError(
                f"zorder_key: column {c!r} has no min/max (empty input or "
                "all-NULL column) — nothing to cluster on"
            )
    bits = min(Z_BITS, 62 // len(cols))
    quant = []
    for c, lo, hi in zip(cols, mins, maxs):
        span = (float(hi) - float(lo)) or 1.0
        q = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            * F.lit(float((1 << bits) - 1))
        ).cast("long")
        q = F.when(F.col(c).isNull(), F.lit(0)).otherwise(
            F.greatest(F.lit(0), F.least(q, F.lit((1 << bits) - 1)))
        )
        quant.append(q)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, q in enumerate(quant):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(quant) + d))
    return z


def zorder_write(df: DataFrame, path: str, cols: list[str], n_files: int = 16) -> None:
    """Write `df` clustered by the Morton order of `cols`: range-partitioned
    into n_files by the z key and sorted by it within each file, so parquet
    footer min/max stats become selective on EVERY clustered dimension at
    once — a range predicate on ANY of the columns skips most files, which
    hive-partitioning (one dimension) and plain sorting (first dimension
    only) cannot give simultaneously. The column min/max scalars are one
    tiny aggregate; everything else is scan-side integer math plus the one
    range-partitioning shuffle any layout rewrite pays.

    At 100 TB this runs as the periodic OPTIMIZE job on hot tables;
    n_files generalizes to target-file-size-derived counts (see compact)."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    mins = [stats[f"mn_{c}"] for c in cols]
    maxs = [stats[f"mx_{c}"] for c in cols]
    z = zorder_key(cols, mins, maxs)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


N_EXPORT_SHARDS_FILES = 16


def shard_export_write(docs: DataFrame, path: str) -> DataFrame:
    """Materialize the q180 deterministic shard export: the corpus under its
    seeded global permutation, written as shard_id=N partitioned parquet
    (one balanced shard per partition directory, rows sorted in permutation
    order within each shard) with the manifest relation returned for the
    caller to persist alongside (`<path>/_manifest` by convention).

    Idempotence: the assignment is a pure function of doc_id and the
    module seeds, so a re-run overwrites each partition with identical
    content — the manifest digests prove it (tests/test_storage.py).

    At 100 TB: one repartition on shard_id (16-way — or files-per-shard
    via a composite (shard_id, skey-range) key), writers stream in sorted
    order; no global sort, no driver materialization beyond the
    PACK_SHARDS prefix offsets and the 16-row manifest."""
    from flink_adcom_spark.queries.text import shard_assignments

    asg = shard_assignments(docs).localCheckpoint(eager=False)
    (
        asg.select("doc_id", "skey", "n_tokens", "start_tok", "shard_id")
        .join(docs, "doc_id")
        .repartition(N_EXPORT_SHARDS_FILES, "shard_id")
        .sortWithinPartitions("shard_id", "skey", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )
    from flink_adcom_spark.queries.text import shard_manifest

    return shard_manifest(asg)



def zorder_write_zrange(df: DataFrame, path: str, cols: list[str], prefix_bits: int = 4):
    """zorder_write's DETERMINISTIC sibling: files are fixed z-RANGE buckets
    (zfile = the z key's top `prefix_bits` bits) instead of sampled
    equal-row ranges. Trades file-size balance on skewed data for a file
    assignment that is a pure function of the row — reproducible across
    runs and engines, so a layout audit (q181) can restate every file's
    membership and min/max stats in SQL and hash-match them externally.
    Returns (mins, maxs) used for quantization so the caller can restate
    the law."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    mins = [stats[f"mn_{c}"] for c in cols]
    maxs = [stats[f"mx_{c}"] for c in cols]
    bits = min(Z_BITS, 62 // len(cols))
    if not 0 < prefix_bits <= len(cols) * bits:
        # a prefix wider than the z key would make the shiftright count
        # negative and scramble the zfile assignment (ADVICE r9)
        raise ValueError(
            f"prefix_bits={prefix_bits} outside (0, {len(cols) * bits}] "
            f"for {len(cols)} cols x {bits} bits"
        )
    z = zorder_key(cols, mins, maxs)
    (
        df.withColumn("__z", z)
        .withColumn(
            "zfile",
            F.shiftright(F.col("__z"), len(cols) * bits - prefix_bits).cast("bigint"),
        )
        .repartition("zfile")
        .sortWithinPartitions("zfile", "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("zfile")
        .parquet(path)
    )
    return mins, maxs
