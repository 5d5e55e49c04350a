"""Skew-handling aggregation: salted two-level aggregate.

The reference simulates a hot key by routing the word "GUTENBERG" to a single
partition with a custom Partitioner (WordCountPreAggregate.java:285-298, X2)
and relies on AdCom's pre-aggregation to absorb it. In Spark the same defense
is structural:

1. For ALGEBRAIC aggregates, Catalyst's partial aggregation already collapses
   a hot key to one row per map partition — no salting needed (why q01-q06
   need nothing special).
2. For aggregates whose partial state is LARGE (collect_list, exact distinct
   sets, large top-N state) a hot key still concentrates final-agg work on one
   reducer. salted_agg splits each key into `buckets` sub-keys, aggregates
   partially per (key, salt), then merges — two small shuffles instead of one
   skewed one. This is exactly Blink's distinct-agg split rule
   (OptimizerConfigOptions.java:60, SURVEY.md §4) generalized to any
   decomposable aggregate.
3. For joins, AQE's skew-join splitting (enabled in session.py) handles it at
   runtime.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_expr: Column,
    buckets: int,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
) -> DataFrame:
    """Two-level (salted) aggregation.

    salt_expr must be deterministic per row (e.g. a row id modulo buckets —
    NOT rand(), so retries/replays stay consistent at scale).
    partial_aggs aggregate within (keys, salt); final_aggs merge the partials
    per keys. The caller guarantees partial+final compose to the intended
    aggregate (count -> sum, sum -> sum, distinct-set -> union, ...)."""
    salted = df.withColumn("__salt", salt_expr % buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_count(df: DataFrame, keys: Sequence[str], salt_expr: Column, buckets: int = 16) -> DataFrame:
    """COUNT(*) per key, skew-proofed (partial counts per salt, then summed)."""
    return salted_agg(
        df,
        keys,
        salt_expr,
        buckets,
        [F.count(F.lit(1)).alias("__partial_cnt")],
        [F.sum("__partial_cnt").alias("cnt")],
    )


def salted_count_distinct(
    df: DataFrame, keys: Sequence[str], distinct_col: str, buckets: int = 16
) -> DataFrame:
    """Exact COUNT(DISTINCT x) per key via the two-level distinct split:
    dedup on (key, x-hash-salt) first, then count — the hot key's distinct
    set is built across `buckets` reducers instead of one."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(buckets)))
    partial = (
        salted.groupBy(*keys, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__partial_nd"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial_nd").alias("n_distinct"))


def salted_top_k(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    k: int,
    salt_on: str,
    salts: int = 64,
) -> DataFrame:
    """Exact per-key top-k by ascending (order_cols) lexicographic order,
    without a skewed-key rank window — the shared fold behind q133 (exact-k
    sampling), q149 (per-source caps), and q153 (posting lists).

    Stage 1 aggregates a sorted k-prefix per (key, salt): the salt spreads a
    hot key over `salts` tasks, so the collect_list buffer holds at most
    group_size/salts rows per task (NOT an O(k) accumulator — the list is
    truncated AFTER the in-buffer sort; what the salting bounds is the
    per-task memory and the stage-2 input, which is the hard salts*k rows
    per key). Stage 2 rank-merges the survivors with an ordinary
    row_number window over a salts*k-per-key relation.

    Returns keys + order_cols + `rnk` (1-based, <= k).

    Precondition: `salt_on` must be HIGH-CARDINALITY within each hot key —
    the salt is xxhash64(salt_on) mod salts, so a low-cardinality salt
    column re-concentrates the hot group in one buffer and the bound above
    evaporates. A per-row id (doc_id, event_id) is the right choice; the
    parameter is required rather than defaulted so the caller states it.
    """
    salt = F.pmod(F.xxhash64(salt_on), F.lit(salts))
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct(*[F.col(c) for c in order_cols]))),
                1,
                k,
            ).alias("__cand")
        )
        .select(*keys, F.explode("__cand").alias("__c"))
        .select(*keys, *[F.col(f"__c.{c}").alias(c) for c in order_cols])
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return stage1.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
