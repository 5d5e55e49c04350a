"""Rate-controlled and skew-varying streaming sources.

Reference surface (SURVEY.md §2.2 S1-S9): busy-sleep rate-limited file replay
(TaxiRideSource.java:33-163, DataRateListener.java:103-106 — 1 rec/s to
2 M rec/s), an in-memory word source (DataRateSource.java:10-54), and a
rate/skew-rotating word source that switches between 4 skewed corpora every
5 minutes (DataRateVariationSource.java:11-74) to exercise the controller.

Spark-first mapping: the built-in `rate` source IS the busy-sleep replay —
`rowsPerSecond` replaces the ns-sleep table, backpressure-aware, per-partition
parallel (S2/S4 parallel variants = numPartitions). Payloads are derived from
the rate source's (timestamp, value) with deterministic column expressions, so
sources stay JVM-side and reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Skewed corpora mirroring WordCountPreAggregateData.java:27-443: a uniform
# profile, a few-distinct-keys profile, and hot-key profiles where the
# sentinel word dominates (the reference routes "GUTENBERG" to one partition
# via a custom Partitioner, WordCountPreAggregate.java:285-298 — in Spark the
# hot key is a data property; AQE's skew handling replaces hand-partitioning).
HOT_WORD = "gutenberg"
CORPORA: tuple[tuple[str, ...], ...] = (
    tuple(f"w{i:02d}" for i in range(64)),  # uniform, 64 keys
    ("alpha", "beta", "gamma", "delta"),  # few distinct keys
    (HOT_WORD,) * 12 + ("alpha", "beta", "gamma", "delta"),  # 75% hot key
    (HOT_WORD,) * 28 + tuple(f"w{i:02d}" for i in range(4)),  # 87% hot key
)


def rate_source(
    spark: SparkSession, rows_per_second: int, num_partitions: int | None = None
) -> DataFrame:
    reader = (
        spark.readStream.format("rate").option("rowsPerSecond", rows_per_second)
    )
    if num_partitions:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()  # columns: timestamp, value


def words_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    corpus_index: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Fixed-corpus word stream (reference DataRateSource semantics)."""
    corpus = F.array(*[F.lit(w) for w in CORPORA[corpus_index]])
    src = rate_source(spark, rows_per_second, num_partitions)
    return src.select(
        F.col("timestamp").alias("ts"),
        F.element_at(corpus, (F.col("value") % len(CORPORA[corpus_index]) + 1).cast("int")).alias(
            "word"
        ),
    )


def varying_words_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    rotate_every_s: int = 300,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-rotating word stream (reference DataRateVariationSource.java:41-67
    rotates 4 corpora every 5 min). The active corpus is a deterministic
    function of the row's rate-source position, so replays are reproducible."""
    src = rate_source(spark, rows_per_second, num_partitions)
    phase = (F.col("value") / (rows_per_second * rotate_every_s)).cast("bigint") % len(CORPORA)
    cases = None
    for i, corpus in enumerate(CORPORA):
        arr = F.array(*[F.lit(w) for w in corpus])
        pick = F.element_at(arr, (F.col("value") % len(corpus) + 1).cast("int"))
        cases = F.when(phase == i, pick) if cases is None else cases.when(phase == i, pick)
    word = cases.otherwise(F.lit(HOT_WORD))
    return src.select(F.col("timestamp").alias("ts"), word.alias("word"))


def skewed_words_stream(
    spark: SparkSession,
    rows_per_second: int = 1000,
    hot_pct: int = 30,
    corpus_index: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hot-key word stream: `hot_pct`% of rows carry one hot word, the rest
    are uniform over the corpus (the reference's skewed benchmark workload,
    nycTaxiRidesSkew30.gz — ~30% of rides on one key). Deterministic in the
    rate-source position, so replays reproduce."""
    corpus = CORPORA[corpus_index]
    arr = F.array(*[F.lit(w) for w in corpus])
    src = rate_source(spark, rows_per_second, num_partitions)
    word = F.when(F.col("value") % 100 < hot_pct, F.lit(HOT_WORD)).otherwise(
        F.element_at(arr, (F.col("value") % len(corpus) + 1).cast("int"))
    )
    return src.select(F.col("timestamp").alias("ts"), word.alias("word"))


def replay_table_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-replay source for any synthetic table (reference S1/S3 file
    sources). Replay rate is governed by maxFilesPerTrigger; at cluster scale
    file-splits give per-partition parallel readers (S2/S4) for free.

    With schema=None the footer schema is peeked with a batch read and the
    result is normalized to the declared table schema — robust to
    physical-type drift across test-data regenerations."""
    if schema is None:
        schema = (
            spark.read.option("pathGlobFilter", f"{table}.parquet")
            .parquet(sf_dir)
            .schema
        )
    reader = spark.readStream.schema(schema).option("pathGlobFilter", f"{table}.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    from ..tables import SCHEMAS, _normalize_to_declared

    if table in SCHEMAS:
        if table == "events":
            from ..tables import normalize_event_ts

            df = normalize_event_ts(df)
        df = _normalize_to_declared(df, table)
    return df
