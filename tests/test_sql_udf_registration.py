"""SQL-callable UDF registration (reference T2/U-surface: GeoUtils and the
scalar UDFs are callable from Table-API/SQL strings). Spark's equivalents:

1. a VECTORIZED pandas_udf registered via spark.udf.register — Arrow-batched,
   callable from any spark.sql(...) string;
2. the builtin-expression form (functions/geo.py) — the hot path this repo
   uses in registry queries.

Both must agree exactly; the test also pins that the expression form is the
one whole-stage codegen can see (no BatchEvalPython/ArrowEvalPython in its
plan), which is WHY the registry queries use it."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from flink_adcom_spark.functions.geo import (
    DELTA_LAT,
    DELTA_LON,
    LAT_NORTH,
    LON_WEST,
    NUMBER_OF_GRID_X,
    map_to_grid_cell,
)


def test_registered_sql_udf_matches_expression_form(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def geo_cell_py(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import numpy as np

        xi = np.floor((lon - LON_WEST) / DELTA_LON).astype("int64")
        yi = np.floor((LAT_NORTH - lat) / DELTA_LAT).astype("int64")
        return (xi + yi * NUMBER_OF_GRID_X).astype("int32")

    spark.udf.register("geo_cell", geo_cell_py)

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        # deterministic subset: an unordered limit can pick different rows
        # across the two executions below
        .filter(F.col("event_id") < 500)
        .select(
            F.col("event_id"),
            (F.lit(-74.0) + (F.col("event_id") % 100) / 350.0).alias("lon"),
            (F.lit(40.6) + (F.col("event_id") % 77) / 250.0).alias("lat"),
        )
    )
    ev.createOrReplaceTempView("geo_pts")

    via_sql = {
        r["event_id"]: r["cell"]
        for r in spark.sql(
            "SELECT event_id, geo_cell(lon, lat) AS cell FROM geo_pts"
        ).collect()
    }
    expr_df = ev.select(
        "event_id", map_to_grid_cell(F.col("lon"), F.col("lat")).alias("cell")
    )
    via_expr = {r["event_id"]: r["cell"] for r in expr_df.collect()}
    assert via_sql == via_expr and via_expr

    # the expression form stays JVM-side: no Python evaluation node in its
    # plan (the reason registry queries use it); the UDF form has one.
    expr_plan = expr_df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in expr_plan
    udf_plan = (
        spark.sql("SELECT geo_cell(lon, lat) AS c FROM geo_pts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in udf_plan
