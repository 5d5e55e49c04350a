"""Taxi-ride query set — SURVEY.md §2.3 Q1-Q7 and Q11.

Each query is the reference's keyed streaming aggregation re-expressed as a
DataFrame plan. Catalyst compiles every groupBy().agg() here to
HashAggregate(partial) -> Exchange(hash on key) -> HashAggregate(final): the
partial stage IS the reference's pre-shuffle combiner
(flink-streaming-java/.../api/datastream/DataStream.java:1403-1436), with
map-side combining and spill built in — nothing to hand-schedule.

Scale notes (100 TB): all queries below shuffle only (key, partial-state) pairs,
never raw rows; key cardinality is |drivers| (low), so the final agg is tiny and
the shuffle is bounded by the partial-agg output, exactly the property AdCom
exists to create. Skewed driver ids are handled by AQE (skewed-partition split)
rather than the reference's manual random pre-shard (Q11 / AveragePreAggregate
random-key trick, SURVEY.md A7) — partial aggregation already neutralizes hot
keys for algebraic aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec_sum
from ..registry import query
from .rides import rides, rides_oracle_cte


# --- Q1: count per driver --------------------------------------------------
# Reference: TaxiRideCountPreAggregate.java:53-70 (+ combiner
# udfs/TaxiRideCountPreAggregateFunction.java:11-28).
@query(
    "q01_ride_count",
    rides_oracle_cte(
        "SELECT driver_id, COUNT(*) AS ride_cnt FROM rides GROUP BY driver_id"
    ),
    tags=("taxi", "agg"),
    bench=True,
)
def q01_ride_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT driverId, COUNT(*) FROM rides GROUP BY driverId."""
    return rides(spark, sf_dir).groupBy("driver_id").agg(F.count("*").alias("ride_cnt"))


# --- Q2: count distinct drivers per day ------------------------------------
# Reference: TaxiRideCountDistinctPreAggregate.java:53-70. The reference's
# combiner is APPROXIMATE (dedups only within a bundle, overcounts across
# bundles — udfs/TaxiRideCountDistinctPreAggregateFunction.java:11-34); its own
# Table variant is exact SQL COUNT(DISTINCT) (TaxiRideCountDistinctTable
# PreAggregate.java:69). We implement the exact semantics. Catalyst plans
# COUNT(DISTINCT) as a two-level aggregate (Expand + partial dedup before the
# shuffle), which is precisely the Blink "distinct-agg split" the reference
# toggles on (OptimizerConfigOptions.java:60) — free here.
@query(
    "q02_ride_count_distinct",
    rides_oracle_cte(
        "SELECT day_of_year, COUNT(DISTINCT driver_id) AS n_drivers "
        "FROM rides GROUP BY day_of_year"
    ),
    tags=("taxi", "agg", "distinct"),
    bench=True,
)
def q02_ride_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT dayOfTheYear, COUNT(DISTINCT driverId) FROM rides GROUP BY dayOfTheYear."""
    return (
        rides(spark, sf_dir)
        .groupBy("day_of_year")
        .agg(F.countDistinct("driver_id").alias("n_drivers"))
    )


# --- Q3: avg passengers per driver -----------------------------------------
# Reference: TaxiRideAvgPassengerPreAggregate.java + (sum,count) combiner
# udfs/TaxiRidePassengerSumAndCountPreAggregateFunction.java:11-40. Spark's avg
# keeps (sum, count) partial state — same algebra, but exact on every output
# (the reference's final reducer divides on every merge and is only correct on
# the last emission; SURVEY.md A4).
@query(
    "q03_ride_avg_passengers",
    rides_oracle_cte(
        "SELECT driver_id, (CAST(SUM(passenger_cnt) AS DOUBLE) / COUNT(*)) AS avg_passengers "
        "FROM rides GROUP BY driver_id"
    ),
    tags=("taxi", "agg"),
)
def q03_ride_avg_passengers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT driverId, AVG(passengerCnt) FROM rides GROUP BY driverId."""
    return (
        rides(spark, sf_dir)
        .groupBy("driver_id")
        .agg((F.sum("passenger_cnt").cast("double") / F.count(F.lit(1))).alias("avg_passengers"))
    )


# --- Q4: multi-average per driver ------------------------------------------
# Reference: TaxiRideAveragePreAggregate / TaxiRideAvgTablePreAggregate.java:70-76
# (3-way (sum,count) combiner udfs/TaxiRidePassengerDistanceTimeSumAndCount
# PreAggregateFunction.java:11-47; distance from P5's haversine map).
@query(
    "q04_ride_multi_avg",
    rides_oracle_cte(
        "SELECT driver_id, (CAST(SUM(passenger_cnt) AS DOUBLE) / COUNT(*)) AS avg_passengers, "
        "ROUND(AVG(distance_km), 4) AS avg_distance_km, "
        "(CAST(SUM(CAST(elapsed_min AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS avg_elapsed_min "
        "FROM rides GROUP BY driver_id"
    ),
    tags=("taxi", "agg"),
)
def q04_ride_multi_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT driverId, AVG(passengerCnt), AVG(distance_km), AVG(elapsed) GROUP BY driverId."""
    return (
        rides(spark, sf_dir)
        .groupBy("driver_id")
        .agg(
            (F.sum("passenger_cnt").cast("double") / F.count(F.lit(1))).alias("avg_passengers"),
            F.round(F.avg("distance_km"), 4).alias("avg_distance_km"),
            (dec_sum("elapsed_min") / F.count(F.lit(1))).alias("avg_elapsed_min"),
        )
    )


# --- Q5: max passengers per driver -----------------------------------------
# Reference: TaxiRideMaxPassengerPreAggregate.java:64-66 + combiner
# udfs/TaxiRideMaxPassengerPreAggregateFunction.java:11-29.
@query(
    "q05_ride_max_passengers",
    rides_oracle_cte(
        "SELECT driver_id, MAX(passenger_cnt) AS max_passengers "
        "FROM rides GROUP BY driver_id"
    ),
    tags=("taxi", "agg"),
)
def q05_ride_max_passengers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT driverId, MAX(passengerCnt) FROM rides GROUP BY driverId."""
    return (
        rides(spark, sf_dir)
        .groupBy("driver_id")
        .agg(F.max("passenger_cnt").alias("max_passengers"))
    )


# --- Q6: sum passengers per driver ------------------------------------------
# Reference: TaxiRideTopNPreAggregate.java:46-63 (sums passengers despite the
# "TopN" name — udfs/TaxiRideTopPassengerPreAggregateFunction.java:11-28).
@query(
    "q06_ride_sum_passengers",
    rides_oracle_cte(
        "SELECT driver_id, CAST(SUM(passenger_cnt) AS BIGINT) AS sum_passengers "
        "FROM rides GROUP BY driver_id"
    ),
    tags=("taxi", "agg"),
)
def q06_ride_sum_passengers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT driverId, SUM(passengerCnt) FROM rides GROUP BY driverId."""
    return (
        rides(spark, sf_dir)
        .groupBy("driver_id")
        .agg(F.sum("passenger_cnt").cast("bigint").alias("sum_passengers"))
    )


# --- Q7: global top-10 ride distances ---------------------------------------
# Reference: TaxiRideDistanceTopNPreAggregate.java:167-206,256-305 (fixed-size
# sorted Double[] merged pairwise). Spark: ORDER BY + LIMIT plans as
# TakeOrderedAndProject — each partition keeps only its local top-10 (the
# combiner role of the reference's bounded array), then the driver merges
# 10*numPartitions rows. No full sort, no full shuffle, scales to any input.
@query(
    "q07_top10_distances",
    rides_oracle_cte(
        "SELECT ride_id, ROUND(distance_km, 6) AS distance_km FROM rides "
        "ORDER BY distance_km DESC, ride_id LIMIT 10"
    ),
    tags=("taxi", "topn"),
)
def q07_top10_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 longest rides (global); ride_id tie-break keeps the set deterministic."""
    return (
        rides(spark, sf_dir)
        .select("ride_id", F.round("distance_km", 6).alias("distance_km"))
        .orderBy(F.desc("distance_km"), F.asc("ride_id"))
        .limit(10)
    )


# --- Q7b: top-3 distances per driver (keyed top-N) ---------------------------
# The keyed form of A8, via ranking window. At scale: single hash shuffle on
# driver_id, per-partition sort bounded by rank pushdown (WindowGroupLimit
# pushes rank<=3 into the sort since Spark 3.5).
@query(
    "q07b_topn_per_driver",
    rides_oracle_cte(
        "SELECT driver_id, ride_id, ROUND(distance_km, 6) AS distance_km FROM ("
        "  SELECT driver_id, ride_id, distance_km, "
        "         ROW_NUMBER() OVER (PARTITION BY driver_id "
        "                            ORDER BY distance_km DESC, ride_id) AS rn "
        "  FROM rides) t WHERE rn <= 3"
    ),
    tags=("taxi", "topn", "window"),
)
def q07b_topn_per_driver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 longest rides per driver (reference A8's bounded-array fold,
    window-rank form). The per-driver rank window shuffles once on
    driver_id — fine here because driver cardinality is high and balanced;
    for few/hot keys the salted two-level fold (q82/q133) is the scale
    form. Ties cannot occur (distances are unique per driver by the trig
    lattice), and ride_id breaks them deterministically anyway."""
    w = Window.partitionBy("driver_id").orderBy(F.desc("distance_km"), F.asc("ride_id"))
    return (
        rides(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("driver_id", "ride_id", F.round("distance_km", 6).alias("distance_km"))
    )


# --- Q11: global average distance -------------------------------------------
# Reference: AveragePreAggregate.java:59-299 keys by rand(0..9) to pre-shard the
# single global key (udfs/TaxiRideDistanceTokenizerMap.java:10-32). Spark's
# partial aggregation already computes one (sum,count) per partition before a
# 1-row shuffle — the random-key trick is subsumed (SURVEY.md A7).
@query(
    "q11_global_avg_distance",
    rides_oracle_cte(
        "SELECT ROUND(AVG(distance_km), 4) AS avg_distance_km FROM rides"
    ),
    tags=("taxi", "agg", "global"),
)
def q11_global_avg_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global AVG(distance_km) over all rides (reference A7). The reference
    pre-shards the single global key by rand(0..9) to parallelize its
    combiner (AveragePreAggregate.java:59-299); Spark's partial aggregation
    already computes one (sum, count) per partition before a 1-row shuffle,
    so the random-key trick is subsumed by the engine."""
    return rides(spark, sf_dir).agg(F.round(F.avg("distance_km"), 4).alias("avg_distance_km"))


# --- grid: rides per NYC grid cell ------------------------------------------
# Exercises the reference's GeoUtils surface (util/GeoUtils.java:10-120, F2) the
# way its DataExpend/grid examples use it: filter to the NYC box, map to a cell,
# count per cell. Grid arithmetic is floor/mod column math on both engines.
@query(
    "q12_grid_cell_counts",
    rides_oracle_cte(
        # Cell widths are injected as repr() of the Python-computed doubles
        # (DuckDB would otherwise evaluate pure literals in DECIMAL arithmetic
        # and land on a different double than Spark's F.lit).
        "SELECT CAST(CAST(FLOOR((start_lon - (-74.05)) / CAST('{dlon!r}' AS DOUBLE)) AS INT) "
        "     + CAST(FLOOR((41.0 - start_lat) / CAST('{dlat!r}' AS DOUBLE)) AS INT) * 250 AS INT) AS cell, "
        "COUNT(*) AS n FROM rides "
        "WHERE start_lon <= -73.7 AND start_lon >= -74.05 "
        "  AND start_lat <= 41.0 AND start_lat >= 40.5 "
        "GROUP BY 1".format(dlon=(-73.7 - (-74.05)) / 250, dlat=(41.0 - 40.5) / 400)
    ),
    tags=("taxi", "geo"),
)
def q12_grid_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ride starts per ~100m NYC grid cell (GeoUtils parity)."""
    from ..functions import geo

    r = rides(spark, sf_dir)
    return (
        r.filter(geo.is_in_nyc(F.col("start_lon"), F.col("start_lat")))
        .select(geo.map_to_grid_cell(F.col("start_lon"), F.col("start_lat")).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )


# --- reference-faithful APPROXIMATE modes ------------------------------------
# The exact queries above deliberately deviate from two reference quirks
# (documented at q02/q03). These two variants reproduce the quirks
# faithfully for byte-level demos against the Flink binary. The reference's
# "bundle" is a processing-time micro-batch (nondeterministic); here a
# deterministic stand-in shard — bundle = (ride_id * knuth) % N — makes the
# quirky result reproducible and oracle-checkable while keeping the exact
# merge algebra of the reference combiners.
REF_BUNDLES = 8
REF_BUNDLE_MULT = 2654435761  # Knuth multiplicative constant (q38 discipline)
# ride_id is bounded to 2^31 BEFORE the Knuth multiply (q38/q152 overflow
# discipline): the product then tops out at ~2^62 < int64, so neither engine
# can overflow at 100 TB-class ride_id ranges (Spark would error under ANSI;
# DuckDB would silently promote to HUGEINT and diverge).
_REF_BUNDLE_SQL = f"((ride_id % 2147483648) * {REF_BUNDLE_MULT}) % {REF_BUNDLES}"


@query(
    "q154_ref_bundle_count_distinct",
    rides_oracle_cte(
        f"""
        SELECT day_of_year, CAST(SUM(d) AS BIGINT) AS n_drivers_bundled
        FROM (SELECT day_of_year, {_REF_BUNDLE_SQL} AS bundle,
                     COUNT(DISTINCT driver_id) AS d
              FROM rides GROUP BY 1, 2)
        GROUP BY day_of_year
        """
    ),
    tags=("taxi", "agg", "distinct", "ref-faithful"),
)
def q154_ref_bundle_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-faithful Q2: the Flink combiner dedups driver ids only
    WITHIN a bundle and the downstream reducer SUMS the per-bundle distinct
    counts, so a driver active in k bundles is counted k times
    (udfs/TaxiRideCountDistinctPreAggregateFunction.java:11-34 — addInput
    sums f2 across bundle flushes). Exact mode is q02; this variant is the
    byte-faithfulness demo with the deterministic bundle stand-in, and its
    result is >= q02's per key by construction (equal iff no driver spans
    bundles; asserted in tests/test_exactness.py).

    Scale shape: two stacked aggregations — (day, bundle) distinct then a
    REF_BUNDLES-fan-in sum per day — both map-side combined; the same
    two-level topology Catalyst already plans for exact COUNT(DISTINCT)."""
    return (
        rides(spark, sf_dir)
        .select("day_of_year", "driver_id", F.expr(_REF_BUNDLE_SQL).alias("bundle"))
        .groupBy("day_of_year", "bundle")
        .agg(F.countDistinct("driver_id").alias("d"))
        .groupBy("day_of_year")
        .agg(F.sum("d").cast("bigint").alias("n_drivers_bundled"))
    )


@query(
    "q155_ref_merge_divide_avg",
    rides_oracle_cte(
        f"""
        SELECT driver_id, st.v AS avg_passengers_ref
        FROM (SELECT driver_id,
                     list_reduce(
                       list({{'b': bundle, 'v': v, 'c': c}} ORDER BY bundle),
                       (acc, x) -> {{'b': acc.b,
                                     'v': (acc.v + x.v) / (acc.c + x.c),
                                     'c': CAST(1 AS BIGINT)}}) AS st
              FROM (SELECT driver_id, {_REF_BUNDLE_SQL} AS bundle,
                           CAST(SUM(passenger_cnt) AS DOUBLE) AS v,
                           COUNT(*) AS c
                    FROM rides GROUP BY 1, 2)
              GROUP BY driver_id)
        """
    ),
    tags=("taxi", "agg", "ref-faithful"),
)
def q155_ref_merge_divide_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-faithful Q3: the Flink reducer merges two partials as
    (v1 + v2) / (c1 + c2) and RESETS the count to 1
    (udfs/TaxiRideAveragePassengersReducer.java:6-13) — non-associative,
    order-dependent, and after the first merge it mixes an AVERAGE with the
    next bundle's SUM. Faithfully: per-bundle (sum, count) partials folded
    in bundle order with exactly that merge law, seeded Flink-reduce-style
    with the first element unreduced — so a single-bundle driver emits its
    raw SUM, quirk included. Exact mode is q03. Both engines fold the
    identical double expression tree in the identical order, so the result
    hash-matches bit-for-bit.

    Scale shape: one (driver, bundle) partial agg (map-side combined), then
    a per-driver fold over <= REF_BUNDLES elements via the JVM-side
    aggregate() HOF — the collect_list is bounded by REF_BUNDLES structs
    per key, never by row count."""
    pb = (
        rides(spark, sf_dir)
        .select("driver_id", "passenger_cnt", F.expr(_REF_BUNDLE_SQL).alias("bundle"))
        .groupBy("driver_id", "bundle")
        .agg(
            F.sum("passenger_cnt").cast("double").alias("v"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    return (
        pb.groupBy("driver_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("bundle").alias("b"), "v", "c"))
            ).alias("ps")
        )
        .select(
            "driver_id",
            F.expr(
                "aggregate(slice(ps, 2, size(ps) - 1), ps[0], "
                "(acc, x) -> named_struct("
                "'b', acc.b, "
                "'v', (acc.v + x.v) / (acc.c + x.c), "
                "'c', CAST(1 AS BIGINT))).v"
            ).alias("avg_passengers_ref"),
        )
    )
