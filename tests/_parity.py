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
