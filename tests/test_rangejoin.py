"""bucketed_range_join contracts: equals the naive non-equi join, half-open
bounds, keyed variant, and a hash-join (never nested-loop) plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_adcom_spark.operators.rangejoin import bucketed_range_join
from flink_adcom_spark.plans import explain


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _data(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:30:00")),
            (2, _ts("2024-01-01T02:00:00")),  # == an interval start (inclusive)
            (3, _ts("2024-01-01T05:00:00")),  # == an interval end (exclusive)
            (4, _ts("2024-01-01T23:00:00")),  # matches nothing
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T03:00:00")),
            (11, _ts("2024-01-01T02:00:00"), _ts("2024-01-01T05:00:00")),  # overlaps 10
            (12, _ts("2024-01-01T04:30:00"), _ts("2024-01-01T06:00:00")),
        ],
        "iid int, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def test_matches_naive_nonequi_join(spark):
    points, intervals = _data(spark)
    got = {
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            points, intervals, start="w_start", end="w_end", bucket_width_s=1800
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        ).collect()
    }
    assert got == naive
    assert got == {(1, 10), (2, 10), (2, 11), (3, 12)}  # half-open bounds


def test_keyed_range_join(spark):
    points = spark.createDataFrame(
        [("a", 1, _ts("2024-01-01T00:30:00")), ("b", 2, _ts("2024-01-01T00:30:00"))],
        "k string, pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("a", 10, _ts("2024-01-01T00:00:00"), _ts("2024-01-01T01:00:00"))],
        "k string, iid int, w_start timestamp, w_end timestamp",
    )
    got = bucketed_range_join(
        points, intervals, start="w_start", end="w_end", on=["k"]
    ).collect()
    # key 'b' point is inside the time range but key-mismatched
    assert [(r["pid"], r["iid"]) for r in got] == [(1, 10)]


def test_plan_is_hash_join_not_nested_loop(spark):
    points, intervals = _data(spark)
    joined = bucketed_range_join(points, intervals, start="w_start", end="w_end")
    plan = explain.formatted_plan(joined)
    assert "NestedLoop" not in plan, plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan), plan


def test_column_collision_rejected(spark):
    points, intervals = _data(spark)
    bad = intervals.withColumnRenamed("iid", "pid")
    try:
        bucketed_range_join(points, bad, start="w_start", end="w_end")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collision" in str(e)
