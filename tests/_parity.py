"""Shared engine-parity normalization: the ONE definition of how Spark and
DuckDB result rows are canonicalized before comparison (Decimal->float, NaN
sentinel, datetime isoformat, columns sorted by name, rows sorted by repr).
Used by tests/test_oracle_parity.py and tests/test_null_robustness.py so the
two parity suites can never drift apart."""

from __future__ import annotations

import math
from decimal import Decimal


def norm_value(v):
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


def norm_rows(recs):
    """Sort by repr: total order even with None/mixed types (rollup
    subtotals)."""
    return sorted((tuple(norm_value(x) for x in r) for r in recs), key=repr)


def spark_sorted_rows(sdf):
    """Collect a Spark DataFrame as (sorted column names, normalized rows)."""
    cols = sorted(sdf.columns)
    return cols, norm_rows([tuple(row[c] for c in cols) for row in sdf.collect()])


def duck_sorted_rows(rel):
    """Fetch a DuckDB relation as (sorted column names, normalized rows)."""
    cols_all = list(rel.columns)
    order = sorted(range(len(cols_all)), key=lambda i: cols_all[i])
    cols = [cols_all[i] for i in order]
    return cols, norm_rows([tuple(r[i] for i in order) for r in rel.fetchall()])


# --- robustness-suite scaffolding --------------------------------------------
# Shared by the NULL / boundary / Unicode robustness suites: build a fixture
# directory that rewrites chosen tables with planted adversarial shapes and
# symlinks the rest, open DuckDB views over it, and assert engine parity for
# one registered query.

SRC_DIR = "/root/testdata/sf0.001"
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def make_fixture_dir(tmp_path_factory, name, table_sql):
    """Create a fixture dir: each (table -> SELECT body) in table_sql is
    rewritten through DuckDB COPY; every other table is symlinked from the
    sf0.001 source."""
    import os

    import duckdb

    dst = tmp_path_factory.mktemp(name)
    con = duckdb.connect()
    for table, body in table_sql.items():
        con.sql(
            f"COPY ({body.format(src=f'{SRC_DIR}/{table}.parquet')}) "
            f"TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    for t in ALL_TABLES:
        p = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(SRC_DIR, f"{t}.parquet"), p)
    return str(dst)


def open_views(fixture_dir):
    """DuckDB connection with the standard views over a fixture dir."""
    import duckdb

    con = duckdb.connect()
    for t in ALL_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{fixture_dir}/{t}.parquet'")
    return con


def assert_engine_parity(spec, spark, fixture_dir, duck_con, name=""):
    """Run a registered query on Spark and its oracle on DuckDB over the same
    fixture dir; assert row-for-row equality under the shared normalization."""
    _, srows = spark_sorted_rows(spec.build(spark, fixture_dir))
    _, drows = duck_sorted_rows(duck_con.sql(spec.oracle))
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)} rows"
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[:2]}"
