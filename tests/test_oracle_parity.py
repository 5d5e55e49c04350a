"""Mirror of the driver's t2 gate: run every registered query on Spark AND its
DuckDB oracle on the same parquet; compare as order-insensitive sorted sets
(columns sorted by name, rows sorted by repr, values normalized).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from flink_adcom_spark import registry

SPECS = registry.all_specs()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    return v


def _rows(recs):
    # sort by repr: total order even with None/mixed types (rollup subtotals)
    return sorted((tuple(_norm(x) for x in r) for r in recs), key=repr)


@pytest.mark.parametrize("name", sorted(n for n, s in SPECS.items() if s.oracle))
def test_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.build(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = _rows(
        [tuple(row[c] for c in spark_cols) for row in sdf.collect()]
    )

    rel = duck.sql(spec.oracle)
    duck_cols_all = list(rel.columns)
    order = sorted(range(len(duck_cols_all)), key=lambda i: duck_cols_all[i])
    duck_cols = [duck_cols_all[i] for i in order]
    duck_rows = _rows([tuple(r[i] for i in order) for r in rel.fetchall()])

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
