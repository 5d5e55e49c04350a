"""Plan-inspection helpers: make the scale contracts assertable.

Every operator in this engine carries implicit physical-plan contracts
(pushdown reached the scan, the dimension side broadcast, partial agg before
the exchange). These helpers parse .explain output so tests/test_plans.py can
enforce them — a plan regression (e.g. a filter stops pushing down after a
refactor) fails CI instead of silently costing 100x at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _split_struct_fields(body: str) -> list[str]:
    """Top-level field names of a struct<...> body: commas are split at
    depth 0 only, so nested types (array<float>, struct<a:int,b:int>) keep
    their fields intact instead of truncating the parse."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [f.split(":")[0].strip() for f in out if f.strip()]


def _read_schema_body(plan: str, start: int) -> str | None:
    """The balanced struct<...> body starting at plan[start] (the first '<'
    after a ReadSchema marker) — a [^>]* regex would stop at the first '>'
    INSIDE a nested type and silently drop every later column."""
    depth = 0
    for i in range(start, len(plan)):
        if plan[i] == "<":
            depth += 1
        elif plan[i] == ">":
            depth -= 1
            if depth == 0:
                return plan[start + 1 : i]
    return None


def scan_columns(df: DataFrame, table_hint: str = "") -> list[str]:
    """Columns actually read from the (first matching) parquet scan — the
    column-pruning contract. `table_hint` (optional) selects among multiple
    scans by substring of the scan's Location/file path, not of the column
    names (column names never contain the table name)."""
    plan = formatted_plan(df)
    for m in re.finditer(r"ReadSchema: struct<", plan):
        body = _read_schema_body(plan, m.end() - 1)
        if body is None:
            continue
        if table_hint:
            # the scan block around this ReadSchema line carries a
            # `Location: ... [file:/...]` line naming the table path
            block_start = plan.rfind("\n\n", 0, m.start())
            block = plan[block_start if block_start != -1 else 0 : m.start()]
            if table_hint not in block:
                continue
        return _split_struct_fields(body)
    return []


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (AQE initial plan). The scale
    budget: one exchange per keyed agg / non-broadcast join, zero extra.
    (`(n) Exchange` nodes only — BroadcastExchange is a separate node name
    and intentionally not counted: broadcasts don't shuffle the fact side.)"""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """True if a map-side PARTIAL HashAggregate runs before an Exchange — the
    built-in equivalent of the reference's combine operator (SURVEY.md §4).

    Checked on the node detail blocks of the formatted plan: a HashAggregate
    whose `Functions` line carries `partial_*` must have a LOWER node id than
    some Exchange (lower id = deeper in the tree = executed earlier), so the
    combine genuinely precedes the shuffle."""
    plan = formatted_plan(df)
    exchange_ids = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) Exchange\b", plan)]
    partial_ids = [
        int(m.group(1))
        for m in re.finditer(
            r"\((\d+)\) HashAggregate[^\n]*\n((?:(?!\(\d+\) )[^\n]*\n)*)", plan
        )
        if "partial_" in m.group(2)
    ]
    if not partial_ids:
        return False
    # no shuffle at all (e.g. single-partition input): the partial agg is
    # still the combine surface — accept it
    return not exchange_ids or min(partial_ids) < max(exchange_ids)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Distinct fused-codegen spans. The formatted plan tags member nodes
    with `[codegen id : N]`; the executed-plan string uses
    `WholeStageCodegen (N)` — count whichever appears."""
    plan = formatted_plan(df)
    ids = set(re.findall(r"\[codegen id : (\d+)\]", plan))
    if ids:
        return len(ids)
    # under AQE the pre-execution formatted plan omits codegen ids; the
    # codegen explain mode still reports "Found N WholeStageCodegen subtrees"
    cg = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", cg)
    return int(m.group(1)) if m else 0
