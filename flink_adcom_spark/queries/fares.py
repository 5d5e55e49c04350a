"""TaxiFare table + ride⋈fare join (FIXTURES.md §4).

The reference declares TaxiFare (rideId, taxiId, driverId, startTime,
paymentType, tip, tolls, totalFare — flink-adcom/.../util/TaxiFare.java) but
no active query consumes it (util/ExerciseBase.java:24-29). We include the
fixture — derived deterministically from events like rides.py, engine-portable
SQL shared with the oracle — and the join extension the reference left on the
table: per-driver fare totals joined back to ride stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec_sum
from ..registry import query
from .rides import RIDES_SQL, rides

# Deterministic fare derivation over the same events rows: ride_id lines up
# 1:1 with rides.ride_id, fare components are exact integer/decimal functions
# of event_id and value so both engines agree bitwise.
FARES_SQL = """
SELECT
  event_id                                            AS ride_id,
  user_id + 1000                                      AS taxi_id,
  user_id                                             AS driver_id,
  ts                                                  AS start_time,
  CASE WHEN event_id % 3 = 0 THEN 'CASH' ELSE 'CARD' END AS payment_type,
  CAST(CAST(value AS DECIMAL(12,2)) * 0.1 AS DOUBLE)  AS tip,
  CAST(event_id % 7 AS DOUBLE)                        AS tolls,
  CAST(CAST(value AS DECIMAL(12,2)) * 1.1 + (event_id % 7) AS DOUBLE) AS total_fare
FROM events
""".strip()


def fares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .. import tables

    tables.load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(FARES_SQL)


@query(
    "q13_driver_fare_stats",
    f"""
    WITH rides AS ({RIDES_SQL}), fares AS ({FARES_SQL})
    SELECT r.driver_id,
           CAST(SUM(CAST(f.total_fare AS DECIMAL(12,3))) AS DOUBLE) AS total_fares,
           CAST(SUM(CAST(f.tip AS DECIMAL(12,3))) AS DOUBLE) AS total_tips,
           COUNT(*) AS n_rides,
           ROUND(SUM(r.distance_km), 4) AS total_km
    FROM rides r JOIN fares f ON r.ride_id = f.ride_id
    GROUP BY r.driver_id
    """,
    tags=("taxi", "join", "agg"),
)
def q13_driver_fare_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-driver revenue + distance: rides joined to fares on ride_id.

    Scale note: both sides derive from the same source and carry the SAME
    partitioning-relevant key; at 100 TB this join co-locates by writing both
    tables bucketed by ride_id (bucketBy) so the sort-merge join needs no
    shuffle. Locally AQE picks a broadcast."""
    r = rides(spark, sf_dir).select("ride_id", "driver_id", "distance_km")
    f = fares(spark, sf_dir).select("ride_id", "total_fare", "tip")
    return (
        r.join(f, "ride_id")
        .groupBy("driver_id")
        .agg(
            # scale 3: fare components carry 3 decimals (value*1.1 / *0.1);
            # a scale-2 cast would round and rounding is not engine-portable
            dec_sum("total_fare", "DECIMAL(12,3)").alias("total_fares"),
            dec_sum("tip", "DECIMAL(12,3)").alias("total_tips"),
            F.count("*").alias("n_rides"),
            F.round(F.sum("distance_km"), 4).alias("total_km"),
        )
    )
