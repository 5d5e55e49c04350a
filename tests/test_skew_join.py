"""AQE skew-join handling: with one pathologically hot key, the sort-merge
join must split the skewed partition (OptimizeSkewedJoin) instead of running
one straggler task — the join-side answer to the reference's GUTENBERG skew
simulator (SURVEY.md X2), and what replaces hand-salting joins at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    # shrink every threshold so local-scale data exhibits the 100 TB behavior
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    yield
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    # left: 150k rows on ONE hot key + a uniform tail; right: small per-key
    hot = spark.range(150_000).select(F.lit(0).alias("k"), F.col("id").alias("a"))
    tail = spark.range(5_000).select((F.col("id") % 100 + 1).alias("k"), F.col("id").alias("a"))
    left = hot.unionByName(tail)
    right = spark.range(101).select(F.col("id").alias("k"), (F.col("id") * 10).alias("b"))

    joined = left.join(right, "k")
    # execute THIS DataFrame's plan (count() would finalize a different
    # queryExecution and leave joined's adaptive plan unfinalized)
    n = len(joined.collect())
    assert n == 155_000

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # OptimizeSkewedJoin marks the join and the skewed shuffle read
    assert "skew=true" in plan or "SkewJoin" in plan, plan[:4000]


def test_salted_top_k_equals_rank_window(spark):
    """The shared salted two-level fold (q133/q149/q153) must return exactly
    the plain rank-window top-k, including under a hot key holding most of
    the rows and under k larger than some groups."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_adcom_spark.operators.skew import salted_top_k

    rng = random.Random(42)
    rows = []
    for i in range(2000):
        key = "hot" if rng.random() < 0.7 else f"k{rng.randrange(8)}"
        rows.append((key, i, rng.randrange(10_000)))
    df = spark.createDataFrame(rows, "key string, doc_id long, score long")

    got = sorted(
        map(
            tuple,
            salted_top_k(df, ["key"], ["score", "doc_id"], 7, salt_on="doc_id", salts=16)
            .select("key", "score", "doc_id", "rnk")
            .collect(),
        )
    )
    w = Window.partitionBy("key").orderBy("score", "doc_id")
    want = sorted(
        map(
            tuple,
            df.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 7)
            .select("key", "score", "doc_id", "rnk")
            .collect(),
        )
    )
    assert got == want
