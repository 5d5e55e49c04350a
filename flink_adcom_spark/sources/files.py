"""Reference wire-format parsers: TaxiRide CSV and TPC-H lineitem.tbl.

A user of the reference feeds it (a) the NYC taxi CSV (11 comma-separated
fields, field 2 is the START/END event token which decides which timestamp is
the event time — TaxiRide.java:66-104) and (b) dbgen's 16-field |-delimited
lineitem.tbl (LineItemSource.java:101-149). These readers accept the same
files, as batch or streaming DataFrames, with the parse quirks reproduced:

- TaxiRide: START rows order timestamps (startTime, endTime) as given; END
  rows swap them (TaxiRide.java:74-91); empty lon/lat parse to 0.0 (:92-95);
  event_time = startTime for START rows else endTime (:157-163).
- lineitem.tbl: dates arrive as yyyy-mm-dd strings; the reference stores them
  as int yyyymmdd (LineItemSource.java:118-120) — we parse to DateType and
  keep the int form available via l_shipdate_int for hash-faithful parity.

Everything is declarative (schema'd CSV scan + column expressions): the parse
runs inside the scan project at full codegen speed, and both readers work
unchanged as spark.readStream sources (S1-S4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TAXI_CSV_FIELDS = [
    "rideId",
    "eventType",  # START | END
    "time1",
    "time2",
    "startLon",
    "startLat",
    "endLon",
    "endLat",
    "passengerCnt",
    "taxiId",
    "driverId",
]

_TAXI_RAW_SCHEMA = T.StructType(
    [T.StructField(f, T.StringType()) for f in TAXI_CSV_FIELDS]
)

TIME_FMT = "yyyy-MM-dd HH:mm:ss"  # TaxiRide.java:28-29 (Joda pattern, same text)


def _f(col: str):
    """float with empty-string -> 0.0 (TaxiRide.java:92-95; Spark's CSV
    reader surfaces empty fields as null)."""
    return F.coalesce(F.col(col).cast("float"), F.lit(0.0).cast("float"))


def read_taxi_ride_csv(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(_TAXI_RAW_SCHEMA).option("header", "false").csv(path)
    is_start = F.col("eventType") == "START"
    t1 = F.to_timestamp("time1", TIME_FMT)
    t2 = F.to_timestamp("time2", TIME_FMT)
    start_time = F.when(is_start, t1).otherwise(t2)  # END rows swap (:74-91)
    end_time = F.when(is_start, t2).otherwise(t1)
    event_time = F.when(is_start, start_time).otherwise(end_time)  # :157-163
    return raw.select(
        F.col("rideId").cast("long").alias("ride_id"),
        is_start.alias("is_start"),
        start_time.alias("start_time"),
        end_time.alias("end_time"),
        F.dayofyear(event_time).alias("day_of_year"),
        _f("startLon").alias("start_lon"),
        _f("startLat").alias("start_lat"),
        _f("endLon").alias("end_lon"),
        _f("endLat").alias("end_lat"),
        F.col("passengerCnt").cast("short").alias("passenger_cnt"),
        F.col("taxiId").cast("long").alias("taxi_id"),
        F.col("driverId").cast("long").alias("driver_id"),
        event_time.alias("event_time"),
    )


LINEITEM_TBL_FIELDS = [
    ("l_orderkey", "long"),
    ("l_partkey", "long"),
    ("l_suppkey", "long"),
    ("l_linenumber", "int"),
    ("l_quantity", "double"),
    ("l_extendedprice", "double"),
    ("l_discount", "double"),
    ("l_tax", "double"),
    ("l_returnflag", "string"),
    ("l_linestatus", "string"),
    ("l_shipdate", "date"),
    ("l_commitdate", "date"),
    ("l_receiptdate", "date"),
    ("l_shipinstruct", "string"),
    ("l_shipmode", "string"),
    ("l_comment", "string"),
]


def read_lineitem_tbl(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """Full 16-field dbgen lineitem.tbl (|-delimited, trailing separator)."""
    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n, _ in LINEITEM_TBL_FIELDS]
        + [T.StructField("_trailing", T.StringType())]
    )
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(schema).option("sep", "|").csv(path)
    cols = [F.col(n).cast(t).alias(n) for n, t in LINEITEM_TBL_FIELDS]
    # the reference's int yyyymmdd form (LineItemSource.java:118-120)
    cols.append(
        (F.year("l_shipdate") * 10000 + F.month("l_shipdate") * 100 + F.dayofmonth("l_shipdate"))
        .cast("int")
        .alias("l_shipdate_int")
    )
    return raw.select(*cols)
