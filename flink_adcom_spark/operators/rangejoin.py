"""Bucketed range join: point-in-interval joins without a nested loop.

Spark plans a bare `points JOIN intervals ON ts BETWEEN start AND end` (no
equi-key) as a broadcast-nested-loop — O(|P|·|I|) comparisons, a non-starter
at scale. The standard fix (the same idea as Databricks' range-join
optimization and Flink's interval-join bucketing) is to manufacture an
equi-key:

    interval -> exploded to every time bucket it overlaps
    point    -> its single bucket
    equi-join on (keys..., bucket)  [hash join, shuffles once]
    exact range predicate as a post-filter

Each point belongs to exactly one bucket and an interval appears at most
once per bucket, so no dedup is needed. Cost: the interval side inflates by
ceil(span/width) rows — pick `bucket_width_s` near the typical interval
span so the inflation is a small constant while each point probes one
bucket.

The reference has no joins at all (SURVEY.md §2.2); this is extension
surface, and the batch twin of the watermarked stream-stream time-bounded
join in streaming/jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    on: list[str] | None = None,
    bucket_width_s: int = 3600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    start <= point_ts < end (half-open), optionally also equi-matching the
    `on` key columns. Returns all point columns + all interval columns.

    Column sets must be disjoint apart from `on` (asserted)."""
    on = on or []
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column collision: {sorted(clash)}; rename first")

    width_us = int(bucket_width_s) * 1_000_000
    # fail fast on unbounded explode: ONE far-future sentinel end (the
    # common open-interval encoding, e.g. 9999-12-31) would generate a
    # ~70M-element sequence per row at the default width and OOM an
    # executor. One cheap agg over the interval side guards the whole job;
    # clip sentinel ends (or widen the buckets) before joining.
    span = (
        F.floor(F.unix_micros(F.col(end)) / width_us)
        - F.floor(F.unix_micros(F.col(start)) / width_us)
    )
    worst = intervals.agg(F.max(span).alias("m")).collect()[0]["m"]
    if worst is not None and worst + 1 > max_span_buckets:
        raise ValueError(
            f"an interval spans {worst + 1} buckets (> max_span_buckets="
            f"{max_span_buckets}) at bucket_width_s={bucket_width_s}; clip "
            "open-ended sentinel intervals or pass a larger bucket width"
        )
    p = points.withColumn(_BUCKET, F.floor(F.unix_micros(F.col(point_ts)) / width_us).cast("long"))
    i = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start)) / width_us).cast("long"),
                # end is exclusive, but a point in end's bucket can still
                # precede it -> include end's bucket
                F.floor(F.unix_micros(F.col(end)) / width_us).cast("long"),
            )
        ),
    )
    joined = p.join(i, on + [_BUCKET]).filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop(_BUCKET)
