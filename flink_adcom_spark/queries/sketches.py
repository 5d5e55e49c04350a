"""Approximate (sketch) aggregates: HyperLogLog distinct + approximate
quantiles.

These are the scale path for Q2-style distinct queries: at 100 TB an exact
distinct is a full dedup shuffle, while approx_count_distinct ships one HLL
sketch per partition per key (KBs) with ~2% error. The reference itself ships
an approximate distinct (its combiner overcounts across bundles — SURVEY.md
A5); ours carries a principled error bound instead.

No DuckDB oracle: sketch results are engine-specific by construction (DuckDB's
approx_count_distinct uses a different HLL seed/width). The driver records the
rows-only check; tests/test_sketches.py bounds the error against the exact
answer instead — a stronger property than cross-engine equality for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load_table


@query(
    "q70_approx_distinct_users",
    None,  # sketches are engine-specific; bounded-error-tested instead
    tags=("events", "sketch", "distinct"),
)
def q70_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct users per event_type (rsd=2%)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )


@query(
    "q71_value_percentiles",
    None,
    tags=("events", "sketch", "quantile"),
)
def q71_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type (GK sketch,
    accuracy 10000 -> error <= 0.01%)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("pcts")
        )
        .select(
            "event_type",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p95"),
            F.col("pcts")[2].alias("p99"),
        )
    )


@query(
    "q72_exact_percentiles",
    "SELECT event_type, "
    "quantile_cont(value, 0.25) AS p25, "
    "quantile_cont(value, 0.5) AS p50, "
    "quantile_cont(value, 0.95) AS p95 "
    "FROM events GROUP BY event_type",
    tags=("events", "quantile"),
)
def q72_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles per event_type (the oracle-checkable
    twin of q71's sketch): Spark `percentile` and DuckDB `quantile_cont`
    share the rank = p*(n-1) linear-interpolation definition.

    Scale note: exact percentiles buffer each group's values — fine for
    bounded group cardinality; q71's GK sketch is the unbounded-scale path."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        )
    )


@query(
    "q96_sketch_rollup",
    None,  # sketches are engine-specific; merge-exactness is asserted in
    # tests/test_sketches.py (rolled-up estimate == direct estimate, exactly)
    tags=("events", "sketch", "rollup", "distinct"),
)
def q96_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the hypertable pattern): persistable per-day
    HLL sketches of distinct users, union-merged into the per-type total
    WITHOUT touching the raw events again.

    This is how a 100 TB serving layer answers "distinct users over any date
    range": the base rollup stores one binary sketch per (day, type) — KBs —
    and range queries fold hll_union_agg over the selected days, an
    O(days*types) aggregation instead of an O(rows) dedup shuffle. The HLL
    union is lossless w.r.t. the sketch (merged estimate == the estimate a
    single pass would produce), asserted exactly in the tests; the direct
    single-pass estimate is emitted alongside for that proof."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sketch"))
    )
    rolled = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("rollup_users")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("direct_users")
    )
    return rolled.join(direct, "event_type").select(
        "event_type", "rollup_users", "direct_users"
    )
