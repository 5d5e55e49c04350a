"""as_of_join operator contracts: backward-inclusive match, left-join nulls,
tolerance cutoff, and the one-exchange plan shape."""

from __future__ import annotations

import datetime as dt

from flink_adcom_spark.operators.asof import as_of_join
from flink_adcom_spark.plans import explain


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (2, _ts("2024-01-01T09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "d"),  # key with no right rows
        ],
        "k int, ts timestamp, l string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # ties left 'a' -> inclusive
            (1, _ts("2024-01-01T11:30:00"), 200),
            (2, _ts("2024-01-01T09:30:00"), 300),  # after left 'c'
        ],
        "k int, ts timestamp, r int",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["l"]): r["r"]
        for r in as_of_join(left, right, on=["k"]).collect()
    }
    assert got == {
        (1, "a"): 100,  # equal-timestamp right row matches (inclusive)
        (1, "b"): 200,  # latest at-or-before 12:00
        (2, "c"): None,  # right row is later -> no match
        (3, "d"): None,  # no right rows for key
    }


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["l"]): r["r"]
        for r in as_of_join(left, right, on=["k"], tolerance_s=600).collect()
    }
    # 'b' matched a row 30 min old -> outside the 10 min tolerance
    assert got[(1, "b")] is None
    assert got[(1, "a")] == 100  # 0 s old: inside


def test_asof_plan_has_single_exchange(spark):
    left, right = _frames(spark)
    joined = as_of_join(left, right, on=["k"])
    assert explain.num_exchanges(joined) == 1, explain.formatted_plan(joined)


def test_asof_column_collision_rejected(spark):
    left, right = _frames(spark)
    bad = right.withColumnRenamed("r", "l")
    try:
        as_of_join(left, bad, on=["k"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collision" in str(e)


def test_asof_forward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["l"]): r["r"]
        for r in as_of_join(left, right, on=["k"], direction="forward").collect()
    }
    assert got == {
        (1, "a"): 100,  # equal-timestamp right row matches (inclusive)
        (1, "b"): None,  # no right row at-or-after 12:00
        (2, "c"): 300,  # earliest right row after 09:00
        (3, "d"): None,  # no right rows for key
    }


def test_asof_forward_tolerance(spark):
    left, right = _frames(spark)
    got = {
        (r["k"], r["l"]): r["r"]
        for r in as_of_join(
            left, right, on=["k"], direction="forward", tolerance_s=600
        ).collect()
    }
    assert got[(1, "a")] == 100  # 0 s ahead: inside
    assert got[(2, "c")] is None  # 30 min ahead -> outside 10 min tolerance


def test_asof_forward_plan_has_single_exchange(spark):
    left, right = _frames(spark)
    joined = as_of_join(left, right, on=["k"], direction="forward")
    assert explain.num_exchanges(joined) == 1, explain.formatted_plan(joined)


def test_asof_null_semantics_match_sql(spark):
    """ANSI semantics pinned against DuckDB's native ASOF JOIN: NULL join
    keys never match, NULL-timestamp right rows never match, and the
    matched row's genuinely-NULL payload comes back as NULL (struct carry)
    instead of leaking an older right row's value."""
    import datetime as dt

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "x"), (None, t(10), "nullkey")],
        "k long, ts timestamp, l string",
    )
    right = spark.createDataFrame(
        [
            (1, t(8), 7.0),     # older, non-null payload
            (1, t(9), None),    # the match for 10:00 — payload genuinely NULL
            (1, None, 99.0),    # NULL ts: must never match
            (None, t(9), 55.0), # NULL key: must never match
        ],
        "k long, ts timestamp, r double",
    )
    got = {
        r["l"]: r["r"]
        for r in as_of_join(left, right, on=["k"]).collect()
    }
    # matched row (09:00) has NULL payload -> NULL, NOT the 08:00 row's 7.0
    assert got["x"] is None
    # NULL-keyed left row matches nothing (not the NULL-keyed right row)
    assert got["nullkey"] is None


def test_asof_null_left_timestamp_never_matches(spark):
    """A NULL LEFT timestamp makes the asof predicate UNKNOWN: the row is
    returned unmatched in BOTH directions (Spark's NULLS-FIRST sort would
    otherwise hand a forward-direction NULL-ts left row the partition's
    earliest right row)."""
    import datetime as dt

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10), "ok"), (1, None, "nullts")],
        "k long, ts timestamp, l string",
    )
    right = spark.createDataFrame(
        [(1, t(11), 7.0)], "k long, ts timestamp, r double"
    )
    fwd = {
        r["l"]: r["r"]
        for r in as_of_join(left, right, on=["k"], direction="forward").collect()
    }
    assert fwd["ok"] == 7.0
    assert fwd["nullts"] is None
    bwd = {
        r["l"]: r["r"]
        for r in as_of_join(left, right, on=["k"], direction="backward").collect()
    }
    assert bwd["nullts"] is None
