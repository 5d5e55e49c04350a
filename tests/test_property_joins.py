"""Property-based differential tests: the composed as-of and range join
operators must equal their naive (non-scalable) formulations on arbitrary
inputs — random keys, duplicate timestamps, empty sides, bucket-boundary
timestamps."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_adcom_spark.operators.asof import as_of_join
from flink_adcom_spark.operators.rangejoin import bucketed_range_join

EPOCH = dt.datetime(2024, 1, 1)

# timestamps on a coarse 10-minute lattice -> plenty of exact collisions and
# bucket-boundary hits (bucket width below is 30 min)
_ts = st.integers(min_value=0, max_value=60).map(
    lambda n: EPOCH + dt.timedelta(minutes=10 * n)
)
_key = st.integers(min_value=0, max_value=2)

_points = st.lists(st.tuples(_key, _ts), min_size=0, max_size=12)
_intervals = st.lists(st.tuples(_key, _ts, st.integers(0, 5)), min_size=0, max_size=8)


def _spark():
    # conftest's session fixture; imported lazily so hypothesis can drive
    from flink_adcom_spark.session import get_spark

    return get_spark(cpus=8)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(points=_points, intervals=_intervals)
def test_range_join_equals_naive(points, intervals):
    spark = _spark()
    p = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)] or [(0, 0, EPOCH)],
        "pid int, k int, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (i, k, t, t + dt.timedelta(minutes=10 * span))
            for i, (k, t, span) in enumerate(intervals)
        ]
        or [(0, 0, EPOCH, EPOCH)],
        "iid int, k int, w_start timestamp, w_end timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in bucketed_range_join(
            p, iv, start="w_start", end="w_end", on=["k"], bucket_width_s=1800
        ).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in p.join(
            iv,
            (p.k == iv.k) & (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        ).collect()
    }
    assert got == naive


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_points, right=_points)
def test_asof_join_equals_naive(left, right):
    spark = _spark()
    # dedupe right to one row per (k, ts) — the operator's documented
    # determinism precondition (keep max rid)
    right_dedup = {}
    for i, (k, t) in enumerate(right):
        right_dedup[(k, t)] = max(right_dedup.get((k, t), -1), i)
    l = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(0, 0, EPOCH)],
        "lid int, k int, ts timestamp",
    )
    r = spark.createDataFrame(
        [(rid, k, t) for (k, t), rid in right_dedup.items()] or [(0, 99, EPOCH)],
        "rid int, k int, rts timestamp",
    )
    got = {
        (row["lid"], row["rid"])
        for row in as_of_join(l, r, on=["k"], left_ts="ts", right_ts="rts").collect()
    }
    # naive: per left row, the right row with max rts <= ts for the same key
    rrows = [(rid, k, t) for (k, t), rid in right_dedup.items()]
    naive = set()
    for lid, (k, t) in enumerate(left or [(0, EPOCH)]):
        cands = [(rt, rid) for rid, rk, rt in rrows if rk == k and rt <= t]
        naive.add((lid, max(cands)[1] if cands else None))
    assert got == naive


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=_points, right=_points)
def test_asof_forward_join_equals_naive(left, right):
    spark = _spark()
    # dedupe right to one row per (k, ts) — forward tie rule: keep min rid
    right_dedup = {}
    for i, (k, t) in enumerate(right):
        cur = right_dedup.get((k, t))
        right_dedup[(k, t)] = i if cur is None else min(cur, i)
    l = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(0, 0, EPOCH)],
        "lid int, k int, ts timestamp",
    )
    r = spark.createDataFrame(
        [(rid, k, t) for (k, t), rid in right_dedup.items()] or [(0, 99, EPOCH)],
        "rid int, k int, rts timestamp",
    )
    got = {
        (row["lid"], row["rid"])
        for row in as_of_join(
            l, r, on=["k"], left_ts="ts", right_ts="rts", direction="forward"
        ).collect()
    }
    # naive: per left row, the right row with min rts >= ts for the same key
    rrows = [(rid, k, t) for (k, t), rid in right_dedup.items()]
    naive = set()
    for lid, (k, t) in enumerate(left or [(0, EPOCH)]):
        cands = [(rt, rid) for rid, rk, rt in rrows if rk == k and rt >= t]
        naive.add((lid, min(cands)[1] if cands else None))
    assert got == naive
