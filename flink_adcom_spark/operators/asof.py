"""Distributed as-of join (point-in-time lookup).

Spark has no built-in ASOF JOIN (DuckDB/Pandas do). The naive formulation —
range join + per-left-row max — explodes to O(|L|·|R|) pairs per key before
pruning. This implementation is the scale-correct composition of built-ins:

    union both sides -> one shuffle on the key -> per-key event-time sort ->
    last non-null carry-forward (window) -> keep left rows

Cost: ONE exchange + one in-partition sort, state O(1) per row — the same
shape as a sort-merge join, with no pair blow-up and no Python in the hot
path. At 100 TB the union shuffles both inputs once on the join key, which
is the lower bound for any co-keyed merge.

The reference has no joins at all (SURVEY.md §2.2 "Joins"); this operator is
part of the engine's extension surface (training pipelines use it for
point-in-time feature joins). Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_s: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the latest right row with
    right_ts <= left_ts (backward-inclusive, the default) or — with
    direction="forward" — the EARLIEST right row with right_ts >= left_ts,
    sharing the `on` keys. Forward is the conversion/outcome lookup ("first
    purchase after this view", "next failure after this deploy"); the plan
    shape is identical, only the carry direction of the window flips.

    Returns all left columns plus the right side's non-key, non-timestamp
    columns (caller renames beforehand to avoid collisions — asserted; to
    surface the matched right timestamp, duplicate it under another name).
    Unmatched left rows keep nulls (left-join semantics). `tolerance_s`
    nulls matches older than the given lookback window. The matched right
    row's payload is returned verbatim, including genuinely-NULL fields
    (struct carry — exact ASOF semantics, matching DuckDB's native
    ASOF JOIN); rows with NULL join keys or a NULL timestamp on the right
    side never match, per ANSI predicate semantics.

    Tie rule: a right row AT the left row's timestamp matches in either
    direction. Among equal right timestamps the winner is
    direction-dependent — backward carries F.last, so the LAST equal-ts
    right row (in ts, original column order) wins; forward carries F.first,
    so the FIRST wins. Pre-dedup the right side for full determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    right_payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = set(left_payload) & set(right_payload)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}; rename first")
    if left_ts in on or right_ts in on:
        raise ValueError("timestamp column cannot be a join key")

    # ANSI join semantics: NULL join keys never match, and a NULL-timestamp
    # right row can never satisfy the r.ts <= l.ts (or >=) asof predicate.
    # Spark's window partitioning groups NULL keys into one partition (NULL
    # "equals" NULL there) and sorts NULL timestamps FIRST — so without this
    # filter a NULL-keyed left row would carry a NULL-keyed right row's
    # payload, and a NULL-ts right row would be carried into every later
    # left row. DuckDB's native ASOF JOIN (the oracle) leaves both
    # unmatched. Dropping them from the RIGHT side makes the window result
    # exactly the SQL result.
    right = right.na.drop(subset=[*on, right_ts])

    # Tag order decides same-timestamp inclusivity: the right row must sort on
    # the CARRY side of the left row — before it for a backward carry (last
    # over preceding rows), after it for a forward carry (first over
    # following rows).
    right_tag, left_tag = (0, 1) if direction == "backward" else (1, 0)

    def side(df: DataFrame, ts: str, tag: int, payload: list[str]) -> DataFrame:
        cols: list[Column] = [F.col(k) for k in on]
        cols.append(F.col(ts).alias(_TS))
        cols.append(F.lit(tag).alias(_SIDE))
        cols += [F.col(c) for c in payload]
        return df.select(*cols)

    r = side(right, right_ts, right_tag, right_payload)
    l = side(left, left_ts, left_tag, left_payload)
    # align column sets: right rows carry null left payload and vice versa
    for c in left_payload:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    for c in right_payload:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    unioned = r.unionByName(l)

    base = Window.partitionBy(*on).orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    # Carry the matched right row as ONE struct, not per-column: a struct
    # built on a right row is non-null even when every FIELD is null, so
    # ignorenulls skips only the interleaved left rows — the matched row's
    # genuinely-NULL payload comes through as NULL (exact ASOF semantics;
    # DuckDB's native ASOF JOIN, the oracle, returns the matched row's
    # fields verbatim). A per-column carry would let an older right row's
    # value leak through a NULL field of the matched row.
    # ANSI: the asof predicate (r.ts <= l.ts or >=) is UNKNOWN for a NULL
    # LEFT timestamp too — such left rows are returned UNMATCHED. Without
    # this, Spark's NULLS-FIRST sort places a NULL-ts left row before every
    # right row, and the forward carry (first over following rows) would
    # hand it the partition's earliest right row; DuckDB's native ASOF JOIN
    # (the oracle) returns NULL. The backward direction is only accidentally
    # immune (nothing precedes a first-sorted row).
    left_ts_null = F.col(_TS).isNull()
    if right_payload:
        pstruct = F.when(
            F.col(_SIDE) == right_tag,
            F.struct(*[F.col(c) for c in right_payload]),
        )
        unioned = unioned.withColumn("__asof_payload", pstruct)
        carried_struct = carry(F.col("__asof_payload"))
        carried = [
            F.when(left_ts_null, F.lit(None)).otherwise(carried_struct[c]).alias(c)
            for c in right_payload
        ]
    else:
        carried = []
    carried_ts = F.when(left_ts_null, F.lit(None)).otherwise(
        carry(F.when(F.col(_SIDE) == right_tag, F.col(_TS)))
    )

    out = (
        unioned.withColumn("__asof_match_ts", carried_ts)
        .select(
            *on,
            F.col(_TS),
            F.col(_SIDE),
            "__asof_match_ts",
            *[c for c in left_payload],
            *carried,
        )
        .filter(F.col(_SIDE) == left_tag)
    )
    if tolerance_s is not None:
        gap = F.col(_TS).cast("double") - F.col("__asof_match_ts").cast("double")
        if direction == "forward":
            gap = -gap
        stale = gap > F.lit(float(tolerance_s))
        for c in right_payload:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn(
            "__asof_match_ts", F.when(stale, F.lit(None)).otherwise(F.col("__asof_match_ts"))
        )
    return out.select(
        *on, F.col(_TS).alias(left_ts), *left_payload, *right_payload
    )
