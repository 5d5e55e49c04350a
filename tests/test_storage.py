"""Storage-layout contracts: partition pruning skips directories; bucketed
tables join with zero exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.operators.storage import bucketed_join, write_bucketed, write_partitioned
from flink_adcom_spark.plans import explain
from flink_adcom_spark.queries.fares import fares
from flink_adcom_spark.queries.rides import rides


def test_partition_pruning_skips_directories(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_type")
    from flink_adcom_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    # pruned scan: only the purchase directory is listed
    plan = explain.formatted_plan(back)
    assert "PartitionFilters" in plan and "purchase" in plan
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """The q13 rides⋈fares join over bucketed layout: zero shuffles."""
    # warehouse dir is a static conf; isolate via a database with an explicit
    # tmp location instead
    spark.sql(f"CREATE DATABASE IF NOT EXISTS stor_test LOCATION '{tmp_path / 'wh'}'")
    spark.sql("DROP TABLE IF EXISTS stor_test.rides_b")
    spark.sql("DROP TABLE IF EXISTS stor_test.fares_b")
    write_bucketed(
        rides(spark, sf_dir).select("ride_id", "driver_id", "distance_km"),
        "stor_test.rides_b",
        ["ride_id"],
        num_buckets=8,
    )
    write_bucketed(
        fares(spark, sf_dir).select("ride_id", "total_fare"),
        "stor_test.fares_b",
        ["ride_id"],
        num_buckets=8,
    )
    # disable auto-broadcast so the test exercises the co-located sort-merge
    # path (at 100 TB neither side would broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "stor_test.rides_b", "stor_test.fares_b", ["ride_id"])
        assert explain.num_exchanges(joined) == 0, explain.formatted_plan(joined)
        n = joined.count()
        assert n == rides(spark, sf_dir).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS stor_test.rides_b")
        spark.sql("DROP TABLE IF EXISTS stor_test.fares_b")
        spark.sql("DROP DATABASE IF EXISTS stor_test")
