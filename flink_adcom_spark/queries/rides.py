"""The `rides` (TaxiRide) table, derived deterministically from `events`.

The reference's primary workload is a stream of TaxiRide records
(flink-adcom/.../util/TaxiRide.java:26-104; schema in FIXTURES.md §1). The test
harness provides an `events` table instead (TESTDATA.md), so we define TaxiRide as
a *deterministic pure-SQL view over events* — every derived column is integer /
trigonometric arithmetic that evaluates bit-identically in Spark SQL and DuckDB.
That single definition (RIDES_SQL below) is used verbatim by both the Spark
queries (via spark.sql on the registered `events` view) and the DuckDB oracles
(as a CTE), so the two sides can never drift.

Column mapping (reference field -> derivation):
  rideId        -> event_id
  isStart       -> event_id % 2 = 0        (START/END token, TaxiRide.java:74-78)
  startTime/endTime -> ts                  (event time, TaxiRide.java:157-163)
  dayOfTheYear  -> dayofyear(ts)           (TaxiRide.java:56,79-87)
  driverId      -> user_id                 (grouping key of Q1, Q3-Q6)
  taxiId        -> user_id + 1000
  passengerCnt  -> event_id % 4 + 1        (small positive short, TaxiRide.java:96)
  start/end lon/lat -> NYC-bounded lattice from event_id (GeoUtils.java:12-16 box)
  distance_km   -> spherical distance (functions/distance.py; reference
                   TaxiRideDistanceCalculator.java:11-27)
  elapsed_min   -> value                   (stands in for RichValues.elapsedTime,
                   TaxiRideRichValues.java:62-67 — the reference's ms*1000*60
                   quirk is intentionally not reproduced; see SURVEY.md §1)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.distance import distance_km_sql

# Valid in BOTH Spark SQL and DuckDB. Integer modulo keeps the lattice exact;
# doubles only appear after CAST so both engines do the same double arithmetic.
# Kept as an "expr AS name" list so the streaming path can selectExpr the same
# projections over a readStream DataFrame (streaming/jobs.py).
RIDES_EXPRS: tuple[str, ...] = (
    "event_id                                                        AS ride_id",
    "(event_id % 2) = 0                                              AS is_start",
    "ts                                                              AS ts",
    "dayofyear(ts)                                                   AS day_of_year",
    "user_id                                                         AS driver_id",
    "user_id + 1000                                                  AS taxi_id",
    "CAST((event_id % 4) + 1 AS INT)                                 AS passenger_cnt",
    "-74.05 + CAST(event_id % 1000 AS DOUBLE) / 10000.0              AS start_lon",
    "40.60 + CAST(event_id % 900 AS DOUBLE) / 10000.0                AS start_lat",
    "-74.05 + CAST((event_id * 7 + 13) % 1000 AS DOUBLE) / 10000.0   AS end_lon",
    "40.60 + CAST((event_id * 11 + 7) % 900 AS DOUBLE) / 10000.0     AS end_lat",
    "value                                                           AS elapsed_min",
    "event_type                                                      AS event_type",
)

_RIDES_BASE_SQL = "SELECT\n  " + ",\n  ".join(RIDES_EXPRS) + "\nFROM events"

RIDES_SQL = (
    "SELECT r.*, "
    + distance_km_sql("start_lat", "start_lon", "end_lat", "end_lon")
    + " AS distance_km FROM (\n"
    + _RIDES_BASE_SQL
    + "\n) r"
)


def rides_oracle_cte(body_sql: str) -> str:
    """Wrap an oracle query body with the shared rides derivation."""
    return f"WITH rides AS (\n{RIDES_SQL}\n)\n{body_sql}"


def rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TaxiRide DataFrame for sf_dir. Registers the `events` view it builds on.

    The derivation is a pure projection over the parquet scan: Catalyst keeps it
    inside one WholeStageCodegen span with the scan, and column pruning still
    reaches parquet (only referenced events columns are read).
    """
    from .. import tables

    tables.load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(RIDES_SQL)
