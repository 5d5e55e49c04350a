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
#
# Precision notes (accepted false positives, since RE2 has no lookaround):
# - phone requires a full 10-digit NANP shape with -/. separators or a
#   parenthesized area code, so numeric ranges like "100-2000" and bare
#   7-digit strings no longer redact;
# - ipv4 octets are clamped to 0-255 (999.999.0.1 no longer matches), but a
#   dotted version string whose components are all <= 255 (e.g. "1.2.3.4")
#   still redacts as an IP — distinguishing it needs context the regex
#   dialect can't express. Measured on prose corpora this shape is rare;
#   the trade is documented rather than silently accepted.
_IPV4_OCTET = r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (
        "phone",
        r"(\(\d{3}\)[-. ]?\d{3}[-.]\d{4}\b|\b\d{3}[-.]\d{3}[-.]\d{4}\b)",
        "[PHONE]",
    ),
    ("ipv4", rf"\b{_IPV4_OCTET}(\.{_IPV4_OCTET}){{3}}\b", "[IP]"),
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
