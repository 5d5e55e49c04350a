"""Planted-defect tests for the audit family: the oracle gate proves engine
parity, but on the clean fixtures every anomaly count is zero — these tests
plant real defects (missing day, null values, orphans, empty docs) and
assert each audit actually fires."""

from __future__ import annotations

import datetime as dt

from flink_adcom_spark.registry import get


def _write_min_tables(spark, sf, events=None, documents=None, lineitem=None,
                      orders=None, customer=None, embeddings=None, supplier=None,
                      nation=None):
    """Write minimal parquet tables into sf (schema-compatible with loaders)."""
    defaults = {
        "events": (
            [(1, dt.datetime(2025, 1, 1, 10), 1, "view", 1.0, "{}")],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ),
        "documents": (
            [(1, "hello world", "en", "src1", 11)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        "lineitem": (
            [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(2025, 1, 1))],
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, "
            "l_tax double, l_returnflag string, l_linestatus string, "
            "l_shipdate timestamp",
        ),
        "orders": (
            [(1, 1, "O", 10.0, dt.datetime(2025, 1, 1), "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ),
        "customer": (
            [(1, "c", 1, 1.0, "BUILDING")],
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
            "c_mktsegment string",
        ),
        "embeddings": (
            [(1, [0.0] * 4, 0)],
            "vec_id long, embedding array<float>, label int",
        ),
        "supplier": (
            [(1, "s", 0, 1.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "nation": (
            [(0, "NATION_0", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
    }
    given = {
        "events": events, "documents": documents, "lineitem": lineitem,
        "orders": orders, "customer": customer, "embeddings": embeddings,
        "supplier": supplier, "nation": nation,
    }
    for name, (rows, schema) in defaults.items():
        data = given[name] if given[name] is not None else rows
        spark.createDataFrame(data, schema).write.mode("overwrite").parquet(
            f"{sf}/{name}.parquet"
        )


def test_quality_expectations_fire_on_planted_anomalies(spark, tmp_path):
    sf = str(tmp_path)
    ts = dt.datetime(2025, 1, 1, 10)
    _write_min_tables(
        spark, sf,
        events=[
            (1, ts, 1, "view", 1.0, "{}"),
            (2, None, 1, "view", 1.0, "{}"),   # null ts
            (3, ts, 1, "view", None, "{}"),    # null value
            (3, ts, 2, "view", 1.0, "{}"),     # duplicate key
        ],
        documents=[
            (1, "hello", "en", "s", 5),
            (2, "", "en", "s", 0),             # empty text
        ],
        lineitem=[
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts),
            (1, 1, 1, 2, -2.0, 10.0, 0.0, 0.0, "N", "O", ts),  # bad quantity
        ],
    )
    rows = {r["table_name"]: r for r in get("q137_quality_expectations").build(spark, sf).collect()}
    assert rows["events"]["n_rows"] == 4
    assert rows["events"]["n_distinct_keys"] == 3      # duplicate detected
    assert rows["events"]["n_anomalies"] == 2          # null ts + null value
    assert rows["documents"]["n_anomalies"] == 1       # empty text
    assert rows["lineitem"]["n_anomalies"] == 1        # negative quantity


def test_day_completeness_flags_planted_gap(spark, tmp_path):
    sf = str(tmp_path)
    _write_min_tables(
        spark, sf,
        events=[
            (1, dt.datetime(2025, 1, 1, 10), 1, "view", 1.0, "{}"),
            (2, dt.datetime(2025, 1, 3, 10), 2, "view", 1.0, "{}"),  # skips Jan 2
        ],
    )
    rows = {str(r["day"]): r for r in get("q138_day_completeness").build(spark, sf).collect()}
    assert set(rows) == {"2025-01-01", "2025-01-02", "2025-01-03"}
    assert not rows["2025-01-01"]["is_gap"] and rows["2025-01-01"]["n_events"] == 1
    assert rows["2025-01-02"]["is_gap"] and rows["2025-01-02"]["n_events"] == 0
    assert not rows["2025-01-03"]["is_gap"]


def test_referential_integrity_counts_planted_orphans(spark, tmp_path):
    sf = str(tmp_path)
    ts = dt.datetime(2025, 1, 1)
    _write_min_tables(
        spark, sf,
        lineitem=[
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts),
            (999, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ts),  # orphan order
        ],
        embeddings=[(1, [0.0] * 4, 0), (777, [0.0] * 4, 0)],    # orphan doc
    )
    rows = {r["fk"]: r for r in get("q142_referential_integrity").build(spark, sf).collect()}
    assert rows["lineitem->orders"]["n_orphans"] == 1
    assert rows["embeddings->documents"]["n_orphans"] == 1
    assert rows["orders->customer"]["n_orphans"] == 0
    assert rows["supplier->nation"]["n_orphans"] == 0


def test_daily_anomaly_flags_planted_spike(spark, tmp_path):
    sf = str(tmp_path)
    events = []
    eid = 0
    for d in range(1, 11):           # 10 steady days of 5 events
        for k in range(5):
            eid += 1
            events.append((eid, dt.datetime(2025, 1, d, 8 + k), k, "view", 1.0, "{}"))
    for k in range(80):              # day 11: 16x spike
        eid += 1
        events.append((eid, dt.datetime(2025, 1, 11, 9), k, "view", 1.0, "{}"))
    _write_min_tables(spark, sf, events=events)
    rows = {str(r["day"]): r for r in get("q143_daily_anomaly").build(spark, sf).collect()}
    assert rows["2025-01-11"]["is_anomaly"]
    # steady days are not flagged (constant series -> zero deviation)
    assert not any(rows[f"2025-01-{d:02d}"]["is_anomaly"] for d in range(2, 11))
