"""NYC geo grid (reference F2: flink-adcom/.../util/GeoUtils.java:10-120).

The reference maps (lon, lat) onto a fixed grid of ~100 m cells over NYC and back.
Pure integer/floor arithmetic — column expressions, no UDF. Constants below are the
reference's public NYC bounding box and cell counts (GeoUtils.java:12-22).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LON_EAST = -73.7
LON_WEST = -74.05
LAT_NORTH = 41.0
LAT_SOUTH = 40.5

NUMBER_OF_GRID_X = 250  # (west-east) / 250 cells ~ 100 m
NUMBER_OF_GRID_Y = 400  # (south-north) / 400 cells ~ 100 m

DELTA_LON = (LON_EAST - LON_WEST) / NUMBER_OF_GRID_X
DELTA_LAT = (LAT_NORTH - LAT_SOUTH) / NUMBER_OF_GRID_Y


def is_in_nyc(lon: Column, lat: Column) -> Column:
    """GeoUtils.isInNYC (GeoUtils.java:26-31)."""
    return (
        (lon <= F.lit(LON_EAST))
        & (lon >= F.lit(LON_WEST))
        & (lat <= F.lit(LAT_NORTH))
        & (lat >= F.lit(LAT_SOUTH))
    )


def map_to_grid_cell(lon: Column, lat: Column) -> Column:
    """GeoUtils.mapToGridCell (GeoUtils.java:35-48): row-major cell id."""
    xi = F.floor((lon - F.lit(LON_WEST)) / F.lit(DELTA_LON)).cast("int")
    yi = F.floor((F.lit(LAT_NORTH) - lat) / F.lit(DELTA_LAT)).cast("int")
    return (xi + yi * F.lit(NUMBER_OF_GRID_X)).cast("int")


def grid_cell_center_lon(cell: Column) -> Column:
    """GeoUtils.getGridCellCenterLon (GeoUtils.java:50-70)."""
    xi = cell % F.lit(NUMBER_OF_GRID_X)
    return (xi.cast("double") * F.lit(DELTA_LON)) + F.lit(LON_WEST) + F.lit(DELTA_LON / 2)


def grid_cell_center_lat(cell: Column) -> Column:
    yi = F.floor(cell / F.lit(NUMBER_OF_GRID_X))
    return F.lit(LAT_NORTH) - (yi.cast("double") * F.lit(DELTA_LAT)) - F.lit(DELTA_LAT / 2)
