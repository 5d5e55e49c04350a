"""GeoUtils parity (reference F2): cell id round-trips to a center within
half a cell of the original coordinate; out-of-box detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_adcom_spark.functions.geo import (
    DELTA_LAT,
    DELTA_LON,
    LAT_NORTH,
    LAT_SOUTH,
    LON_EAST,
    LON_WEST,
    NUMBER_OF_GRID_X,
    NUMBER_OF_GRID_Y,
    grid_cell_center_lat,
    grid_cell_center_lon,
    is_in_nyc,
    map_to_grid_cell,
)


def test_cell_roundtrip_within_half_cell(spark):
    # a lattice of in-box coordinates (staying strictly inside the box)
    pts = [
        (LON_WEST + (i + 0.3) * (LON_EAST - LON_WEST) / 10,
         LAT_SOUTH + (j + 0.7) * (LAT_NORTH - LAT_SOUTH) / 10)
        for i in range(10)
        for j in range(10)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = (
        df.withColumn("cell", map_to_grid_cell(F.col("lon"), F.col("lat")))
        .withColumn("clon", grid_cell_center_lon(F.col("cell")))
        .withColumn("clat", grid_cell_center_lat(F.col("cell")))
        .collect()
    )
    for r in out:
        assert 0 <= r["cell"] < NUMBER_OF_GRID_X * NUMBER_OF_GRID_Y
        assert abs(r["clon"] - r["lon"]) <= DELTA_LON / 2 + 1e-12, r
        assert abs(r["clat"] - r["lat"]) <= DELTA_LAT / 2 + 1e-12, r


def test_is_in_nyc_box(spark):
    df = spark.createDataFrame(
        [(-73.9, 40.75, True), (-74.3, 40.75, False), (-73.9, 41.2, False), (0.0, 0.0, False)],
        "lon double, lat double, want boolean",
    )
    rows = df.withColumn("got", is_in_nyc(F.col("lon"), F.col("lat"))).collect()
    assert all(r["got"] == r["want"] for r in rows)


def test_adjacent_cells_differ_by_one(spark):
    """Row-major layout: +1 cell eastward, +NUMBER_OF_GRID_X southward."""
    base_lon, base_lat = -74.0, 40.9
    df = spark.createDataFrame(
        [
            (base_lon, base_lat),
            (base_lon + DELTA_LON, base_lat),
            (base_lon, base_lat - DELTA_LAT),
        ],
        "lon double, lat double",
    )
    cells = [r["cell"] for r in df.withColumn("cell", map_to_grid_cell(F.col("lon"), F.col("lat"))).collect()]
    assert cells[1] == cells[0] + 1
    assert cells[2] == cells[0] + NUMBER_OF_GRID_X
