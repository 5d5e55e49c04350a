"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_adcom_spark.registry: every implemented operator from
SURVEY.md §2 is registered there with a Spark builder and (where SQL-expressible)
a DuckDB oracle. See flink_adcom_spark/queries/*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_adcom_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 over sf0.001 (full semantics, exact-decimal
    money aggregates)."""
    return registry.get("q08_tpch_q1").build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.build for name, spec in sorted(registry.all_specs().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted -> rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in sorted(registry.all_specs().items())
        if spec.oracle is not None
    }
