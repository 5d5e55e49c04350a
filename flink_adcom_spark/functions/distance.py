"""Spherical ride distance (reference F1).

Re-expresses the reference's acos-based spherical distance
(flink-adcom/.../util/TaxiRideDistanceCalculator.java:11-27: deg->rad, acos of the
spherical law of cosines, rad->deg, * 60 * 1.1515 statute miles, * 1.609344 km)
as a pure column expression — JVM-side, whole-stage-codegen'd, no UDF.

The expression text is shared verbatim between Spark SQL and the DuckDB oracle:
both dialects have sin/cos/acos/radians/degrees/least/greatest with C-library
semantics, so per-row results are bit-identical across engines.

The acos argument is clamped to [-1, 1]: for identical points the raw argument can
exceed 1 by one ulp and acos would return NaN (the reference guards this with an
equality short-circuit at TaxiRideDistanceCalculator.java:12-14; we keep that
guard too so the zero-distance branch is exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MILES_PER_DEGREE = "60.0 * 1.1515"
_KM_PER_MILE = "1.609344"


def distance_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Distance expression as SQL text valid in both Spark SQL and DuckDB.

    Arguments are parenthesized on interpolation, so compound expressions
    (e.g. ``"lon_base - lon_off"``) keep their meaning instead of being
    mangled by operator precedence inside ``radians(a - b)``."""
    lat1, lon1, lat2, lon2 = (f"({c})" for c in (lat1, lon1, lat2, lon2))
    arg = (
        f"sin(radians({lat1})) * sin(radians({lat2})) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * cos(radians({lon1} - {lon2}))"
    )
    return (
        f"CASE WHEN {lat1} = {lat2} AND {lon1} = {lon2} THEN 0.0 "
        f"ELSE degrees(acos(least(1.0, greatest(-1.0, {arg})))) "
        f"* {_MILES_PER_DEGREE} * {_KM_PER_MILE} END"
    )


def distance_km(lat1: str, lon1: str, lat2: str, lon2: str) -> Column:
    """Column form for DataFrame pipelines (same expression, via expr)."""
    return F.expr(distance_km_sql(lat1, lon1, lat2, lon2))
