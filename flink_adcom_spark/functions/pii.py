"""PII detection and redaction expressions for corpus scrubbing.

A 100 TB pre-training corpus is scrubbed scan-side: each pattern is a
`regexp_replace` over the text column, fused into whole-stage codegen with
zero shuffles — redaction cost is one pass over the bytes it already reads.

Patterns are restricted to syntax shared by Java regex (Spark) and RE2
(DuckDB) so the same rule set runs identically in the engine and the
oracle: character classes, bounded repetition, alternation — no lookaround,
no backreferences (RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern table: (name, regex, replacement token). Order matters — emails are
# redacted before bare domains/IPs so an address never half-survives.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its redaction token (chained
    regexp_replace, all scan-side)."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, token in PII_PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_count(col: Column | str, kind: str) -> Column:
    """Number of matches of one PII kind in the column."""
    c = F.col(col) if isinstance(col, str) else col
    pat = {name: p for name, p, _ in PII_PATTERNS}[kind]
    return F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of redact_pii (same patterns, 'g' flag for replace-all)."""
    for _name, pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


def sql_pii_count(expr: str, kind: str) -> str:
    pat = {name: p for name, p, _ in PII_PATTERNS}[kind]
    return f"len(regexp_extract_all({expr}, '{pat}'))"
