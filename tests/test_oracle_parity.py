"""Mirror of the driver's t2 gate: run every registered query on Spark AND its
DuckDB oracle on the same parquet; compare as order-insensitive sorted sets
(columns sorted by name, rows sorted by repr, values normalized).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from flink_adcom_spark import registry

from _parity import duck_sorted_rows, spark_sorted_rows

SPECS = registry.all_specs()


@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.oracle))
def test_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    spark_cols, spark_rows = spark_sorted_rows(spec.build(spark, sf_dir))
    duck_cols, duck_rows = duck_sorted_rows(duck.sql(spec.oracle))

    assert spark_cols == duck_cols, f"{name}: column sets differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(spark_rows, duck_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_every_query_has_registry_entry():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
