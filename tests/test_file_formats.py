"""Reference wire-format readers: TaxiRide CSV (START/END swap, empty-coord,
event-time rules) and dbgen lineitem.tbl."""

from __future__ import annotations

import datetime as dt

from flink_adcom_spark.sources.files import read_lineitem_tbl, read_taxi_ride_csv

TAXI_CSV = """\
1,START,2020-01-05 10:00:00,2020-01-05 10:20:00,-73.98,40.75,-73.99,40.76,2,7001,42
1,END,2020-01-05 10:00:00,2020-01-05 10:20:00,-73.98,40.75,-73.99,40.76,2,7001,42
2,START,2020-02-01 08:00:00,2020-02-01 08:30:00,,,,,1,7002,43
"""

LINEITEM_TBL = (
    "1|101|9|1|17|30515.25|0.04|0.02|N|O|1996-03-13|1996-02-12|1996-03-22|"
    "DELIVER IN PERSON|TRUCK|egular courts above the|\n"
    "1|67|10|2|36|47925.0|0.09|0.06|N|O|1996-04-12|1996-02-28|1996-04-20|"
    "TAKE BACK RETURN|MAIL|ly final dependencies: slyly bold |\n"
)


def test_taxi_ride_csv_parse(spark, tmp_path):
    p = tmp_path / "rides.csv"
    p.write_text(TAXI_CSV)
    rows = {(r["ride_id"], r["is_start"]): r for r in read_taxi_ride_csv(spark, str(p)).collect()}
    start = rows[(1, True)]
    end = rows[(1, False)]
    # START keeps timestamp order; END swaps (TaxiRide.java:74-91)
    assert start["start_time"] == dt.datetime(2020, 1, 5, 10, 0)
    assert start["end_time"] == dt.datetime(2020, 1, 5, 10, 20)
    assert end["start_time"] == dt.datetime(2020, 1, 5, 10, 20)
    assert end["end_time"] == dt.datetime(2020, 1, 5, 10, 0)
    # event time: startTime for START rows, endTime for END rows (:157-163)
    assert start["event_time"] == start["start_time"]
    assert end["event_time"] == end["end_time"]
    assert start["day_of_year"] == 5
    # empty lon/lat -> 0.0 (:92-95)
    empty = rows[(2, True)]
    assert empty["start_lon"] == 0.0 and empty["end_lat"] == 0.0
    assert empty["passenger_cnt"] == 1 and empty["driver_id"] == 43


def test_lineitem_tbl_parse(spark, tmp_path):
    p = tmp_path / "lineitem.tbl"
    p.write_text(LINEITEM_TBL)
    rows = read_lineitem_tbl(spark, str(p)).collect()
    assert len(rows) == 2
    r = rows[0]
    assert r["l_orderkey"] == 1 and r["l_partkey"] == 101
    assert r["l_extendedprice"] == 30515.25 and r["l_discount"] == 0.04
    assert r["l_shipdate"] == dt.date(1996, 3, 13)
    assert r["l_shipdate_int"] == 19960313  # LineItemSource.java:118-120 form
    assert r["l_shipmode"] == "TRUCK"
    assert rows[1]["l_comment"].startswith("ly final dependencies")


def test_lineitem_tbl_q1_semantics(spark, tmp_path):
    """The .tbl reader feeds the Q1 aggregation directly (same column names
    as the parquet path)."""
    from pyspark.sql import functions as F

    p = tmp_path / "lineitem.tbl"
    p.write_text(LINEITEM_TBL)
    li = read_lineitem_tbl(spark, str(p))
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    ).collect()
    assert len(out) == 1 and out[0]["sum_qty"] == 53.0 and out[0]["n"] == 2


def test_format_matrix_roundtrip(spark, sf_dir, tmp_path):
    """Lake-format breadth: the same table round-trips losslessly through
    parquet, ORC, JSON and headered CSV (schema re-imposed on read for the
    text formats, as any production ingest would)."""
    from pyspark.sql import functions as F

    from flink_adcom_spark.tables import load_table

    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .limit(500)
    )
    want = sorted(tuple(r) for r in src.collect())
    schema = src.schema

    for fmt, opts in (
        ("parquet", {}),
        ("orc", {}),
        ("json", {}),
        ("csv", {"header": "true"}),
        # native since Spark 4 (the XML data source moved in-tree)
        ("xml", {"rootTag": "rows", "rowTag": "row"}),
    ):
        out = str(tmp_path / fmt)
        src.write.mode("overwrite").options(**opts).format(fmt).save(out)
        back = spark.read.options(**opts).schema(schema).format(fmt).load(out)
        got = sorted(tuple(r) for r in back.select(*src.columns).collect())
        assert got == want, fmt


def test_avro_is_classpath_gated(spark, sf_dir, tmp_path):
    """Avro ships as an external Spark module; this environment does not
    carry it, and the failure must be the actionable built-in message (how
    to deploy spark-avro), not a silent wrong result. If a deployment adds
    the module, the roundtrip contract above applies unchanged."""
    from flink_adcom_spark.tables import load_table

    src = load_table(spark, sf_dir, "region")
    try:
        src.write.mode("overwrite").format("avro").save(str(tmp_path / "avro"))
    except Exception as e:
        assert "avro" in str(e).lower(), e
    else:  # classpath provides it -> full roundtrip must hold
        back = spark.read.format("avro").load(str(tmp_path / "avro"))
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
