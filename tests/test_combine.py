"""combine/adCombine parity layer tests (operators/combine.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.operators.combine import (
    CountPreAggregate,
    TopNDistancePreAggregate,
    combine,
    combine_generic,
)
from flink_adcom_spark.queries.rides import rides


def test_combine_declarative_equals_groupby(spark, sf_dir):
    r = rides(spark, sf_dir)
    got = {
        row["driver_id"]: row["cnt"]
        for row in combine(r, ["driver_id"], [F.count("*").alias("cnt")]).collect()
    }
    want = {
        row["driver_id"]: row["count"]
        for row in r.groupBy("driver_id").count().collect()
    }
    assert got == want


def test_combine_generic_count_fold(spark, sf_dir):
    """Tier-2 arbitrary fold reproduces the declarative count exactly."""
    r = rides(spark, sf_dir).select("driver_id")
    out = combine_generic(
        r, ["driver_id"], CountPreAggregate("driver_id"), "key long, cnt long"
    )
    got = {row["key"]: row["cnt"] for row in out.collect()}
    want = {row["driver_id"]: row["count"] for row in r.groupBy("driver_id").count().collect()}
    assert got == want


def test_combine_generic_topn_fold(spark, sf_dir):
    """Reference A8 fold (bounded sorted array) vs the window-rank plan."""
    r = rides(spark, sf_dir).select("driver_id", "distance_km")
    out = combine_generic(
        r,
        ["driver_id"],
        TopNDistancePreAggregate(n=3),
        "key long, rnk int, distance_km double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("driver_id").orderBy(F.desc("distance_km"))
    want_df = (
        r.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)
    )
    got = {(row["key"], row["rnk"]): round(row["distance_km"], 9) for row in out.collect()}
    want = {
        (row["driver_id"], row["rnk"]): round(row["distance_km"], 9)
        for row in want_df.collect()
    }
    assert got == want


def test_combine_plans_partial_aggregate(spark, sf_dir):
    """The declarative combiner's plan contract: a partial HashAggregate runs
    before the exchange (the reference's combine operator, for free)."""
    from flink_adcom_spark.plans.explain import formatted_plan, num_exchanges

    df = combine(rides(spark, sf_dir), ["driver_id"], [F.count("*").alias("cnt")])
    assert "partial_count" in formatted_plan(df)
    assert num_exchanges(df) == 1


def test_operator_package_exports_resolve():
    """The curated operators façade imports cleanly and exposes every
    documented name (a user's `from flink_adcom_spark.operators import x`
    contract)."""
    import flink_adcom_spark.operators as ops

    for name in (
        "as_of_join", "bucketed_range_join", "combine", "combine_generic",
        "PreAggregateFunction", "connected_components", "lloyd_kmeans",
        "assign_clusters", "cms_build", "cms_probe", "heavy_hitter_audit",
        "salted_agg", "salted_count_distinct", "l2_normalize",
        "quantize_int8", "write_bucketed", "upsert_partitions",
        "extract_features", "resize_images", "sample_frames",
    ):
        assert callable(getattr(ops, name)) or name == "PreAggregateFunction"
