"""SQL-surface breadth: the three reference entry points plus the relational
operators the reference gets from upstream Flink SQL but never exercises
(SURVEY.md §2.2 "Sorts/limits", "Set operations", T1-T4): verbatim SQL-string
queries, rollup, pivot, having, set ops, a real TPC-H Q3, and salted skew
aggregation.

The reference's three entry points (DataStream fluent / Table API / SQL
string) collapse to one plan space in Spark (SURVEY.md §3) — q61 proves it by
running the reference's own SQL text and matching the DataFrame twin's oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_dec_sum
from ..operators.skew import salted_count, salted_count_distinct
from ..registry import query
from ..tables import load_table
from .rides import rides, rides_oracle_cte


# --- T3: verbatim SQL-string entry point -------------------------------------
@query(
    "q61_sql_count_distinct",
    rides_oracle_cte(
        "SELECT day_of_year, COUNT(DISTINCT driver_id) AS n_drivers "
        "FROM rides GROUP BY day_of_year"
    ),
    tags=("taxi", "sql-entry", "distinct"),
)
def q61_sql_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal SQL query (TaxiRideCountDistinctTable
    PreAggregate.java:69-70: 'SELECT dayOfTheYear, COUNT(DISTINCT driverId)
    FROM TaxiRide GROUP BY dayOfTheYear') through createOrReplaceTempView +
    spark.sql — same Catalyst plan as the DataFrame twin q02."""
    rides(spark, sf_dir).createOrReplaceTempView("TaxiRide")
    return spark.sql(
        "SELECT day_of_year, COUNT(DISTINCT driver_id) AS n_drivers "
        "FROM TaxiRide GROUP BY day_of_year"
    )


# --- TPC-H Q3 (shipping priority) --------------------------------------------
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01"


@query(
    "q62_tpch_q3",
    f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
      AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("tpch", "join", "topn"),
)
def q62_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 adapted to the synthetic schema (o_orderpriority for
    o_shippriority). Both dimension filters cut before the join; customer and
    orders broadcast; exact-decimal revenue makes the top-10 set stable."""
    from ..functions.exact import money, rate

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(money("l_extendedprice") * (1 - rate("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# --- ROLLUP ------------------------------------------------------------------
@query(
    "q63_rollup_flag_status",
    "SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, "
    "COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n, "
    f"{sql_dec_sum('l_extendedprice')} AS sum_price "
    "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)",
    tags=("tpch", "agg", "rollup"),
)
def q63_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (flag, flag+status, grand total) in one pass —
    Catalyst plans rollup as a single Expand + aggregate, not three scans."""
    from ..functions.exact import dec_sum

    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dec_sum("l_extendedprice").alias("sum_price"))
        # subtotal rows carry NULL keys; 'ALL' sentinel keeps result rows
        # totally ordered / hashable in any comparison harness
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


# --- PIVOT -------------------------------------------------------------------
@query(
    "q64_pivot_linestatus",
    "SELECT l_returnflag, "
    "CAST(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS O, "
    "CAST(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS F "
    "FROM lineitem GROUP BY l_returnflag",
    tags=("tpch", "agg", "pivot"),
)
def q64_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity matrix returnflag x linestatus via pivot (oracle spells the
    equivalent conditional aggregation)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity").cast("double"))
    )


# --- HAVING ------------------------------------------------------------------
@query(
    "q65_big_orders",
    "SELECT l_orderkey, CAST(SUM(l_quantity) AS DOUBLE) AS total_qty "
    "FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150",
    tags=("tpch", "agg", "having"),
)
def q65_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with > 150 total units (TPC-H Q18 shape: agg + HAVING).
    Whole-number quantities make the predicate exact in fp64."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )


# --- set operations ----------------------------------------------------------
@query(
    "q66_purchasers_with_errors",
    "SELECT user_id FROM events WHERE event_type = 'purchase' "
    "INTERSECT SELECT user_id FROM events WHERE event_type = 'error'",
    tags=("events", "setop"),
)
def q66_purchasers_with_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and errored (INTERSECT -> semi-join plan)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "q67_viewers_never_purchased",
    "SELECT user_id FROM events WHERE event_type = 'view' "
    "EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase'",
    tags=("events", "setop"),
)
def q67_viewers_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewers with no purchase (EXCEPT -> anti-join plan)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # set-EXCEPT (exceptAll would keep surplus dup views)


# q67 is structurally empty on the synthetic data (every one of the 150 users
# has every event type), so its external green rows only ever proved the
# empty relation. This twin keeps the exact EXCEPT topology but subtracts a
# REAL subset — purchasers above a value threshold — so the driver gate
# finally hash-matches a non-empty set difference (30 rows at sf0.01).
BIG_PURCHASE = 100.0


@query(
    "q67b_viewers_no_big_purchase",
    "SELECT user_id FROM events WHERE event_type = 'view' "
    f"EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase' AND value > {BIG_PURCHASE}",
    tags=("events", "setop", "planted"),
)
def q67b_viewers_no_big_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viewers who never made a purchase above BIG_PURCHASE — q67's EXCEPT
    plan proven on a non-empty result (the subtrahend is a strict subset of
    purchases, so some viewers survive). The threshold comparison is on the
    raw stored double against an exactly-representable literal: no rounding
    can flip a row between engines."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > BIG_PURCHASE)
    ).select("user_id")
    return a.subtract(b)


# --- salted skew aggregation (X2 parity) -------------------------------------
@query(
    "q60_salted_type_counts",
    "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type",
    tags=("events", "agg", "skew"),
)
def q60_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event counts per type via the salted two-level aggregate
    (operators/skew.py). event_type has only 5 values — exactly the
    hot-key regime the reference's GUTENBERG partitioner simulates (X2);
    the salt spreads each key over 16 reducers, the merge shuffles 80 rows.
    Result must equal the plain groupBy (the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"], F.col("event_id"), buckets=16)


@query(
    "q68_salted_distinct_users",
    "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct "
    "FROM events GROUP BY event_type",
    tags=("events", "agg", "skew", "distinct"),
)
def q68_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per type via the two-level distinct split
    (Blink's distinct-agg split, generalized — operators/skew.py)."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_count_distinct(ev, ["event_type"], "user_id", buckets=16)
    return out.select("event_type", F.col("n_distinct").cast("bigint").alias("n_distinct"))


@query(
    "q69_grouping_sets",
    "SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n "
    "FROM events GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())",
    tags=("events", "agg", "grouping-sets"),
)
def q69_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS: per-type totals, per-day totals, and the grand total in
    one pass (Catalyst plans a single Expand + aggregate — one scan instead
    of three; the same Expand machinery the distinct-split uses)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        "SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n "
        "FROM events_gs GROUP BY GROUPING SETS ((event_type), (CAST(ts AS DATE)), ())"
    )


# --- CUBE --------------------------------------------------------------------
@query(
    "q75_cube_flag_status",
    "SELECT COALESCE(l_returnflag, 'ALL') AS returnflag, "
    "COALESCE(l_linestatus, 'ALL') AS linestatus, COUNT(*) AS n, "
    f"{sql_dec_sum('l_extendedprice')} AS sum_price "
    "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
    tags=("tpch", "agg", "cube"),
)
def q75_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations (completes q63's ROLLUP with the
    status-only marginals) — one Expand + single aggregate pass, the shuffle
    carries 4x the group keys but still O(groups), not O(rows)."""
    from ..functions.exact import dec_sum

    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dec_sum("l_extendedprice").alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )
