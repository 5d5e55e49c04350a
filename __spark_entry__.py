"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over flink_adcom_spark.registry: every implemented operator from
SURVEY.md §2 is registered there with a Spark builder and (where SQL-expressible)
a DuckDB oracle. See flink_adcom_spark/queries/*.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_adcom_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 over sf0.001 (full semantics, exact-decimal
    money aggregates)."""
    return registry.get("q08_tpch_q1").build(spark, SMOKE_SF_DIR)


# --- driver-gate rotation -----------------------------------------------------
# The external correctness gate records at most 50 entries per round (sorted
# names; CORRECTNESS_r01.json stopped at the 50th name, q47). Rotation history
# is in COVERAGE.md §gate. Round 3 ran against a REGENERATED events table
# (ts moved from TIMESTAMP(NANOS) to TIMESTAMP(MICROS)), which broke every
# events-reading query until tables.normalize_event_ts; the round-4 gate
# therefore re-greens (a) all 22 entries that were red in CORRECTNESS_r03,
# (b) the 20 events-derived queries whose only green row predates the data
# regeneration, (c) q91 (registered after the r2/r3 gate froze, never
# driver-checked), plus 7 stable non-events anchors. The FULL registry
# (93 queries) remains verified by the in-repo mirror
# (tests/test_oracle_parity.py) at sf0.001 and the driver simulation in
# .claude/skills/verify at sf0.01.
_ROUND4_GATE = frozenset(
    # red in CORRECTNESS_r03 (events ts regeneration + q86 HUGEINT oracle
    # type + q80 unsortable array cell) -> re-green with this round's fixes
    [
        "q57_kmeans", "q58_diversity_sample", "q60_salted_type_counts",
        "q61_sql_count_distinct", "q66_purchasers_with_errors",
        "q67_viewers_never_purchased", "q68_salted_distinct_users",
        "q69_grouping_sets", "q70_approx_distinct_users",
        "q71_value_percentiles", "q72_exact_percentiles",
        "q76_purchase_error_reconcile", "q78_value_deciles",
        "q80_media_features", "q81_frame_samples", "q82_generic_topn_fold",
        "q83_stream_incremental_mv", "q84_stream_view_purchase_join",
        "q85_stream_sessions", "q86_sequence_pack", "q87_greedy_pack",
        "q90_stream_dedup",
    ]
    # events-derived, last green row (r01) predates the ts regeneration
    + [
        "q01_ride_count", "q02_ride_count_distinct",
        "q03_ride_avg_passengers", "q04_ride_multi_avg",
        "q05_ride_max_passengers", "q06_ride_sum_passengers",
        "q07_top10_distances", "q07b_topn_per_driver",
        "q11_global_avg_distance", "q12_grid_cell_counts",
        "q13_driver_fare_stats", "q20_tumbling_hourly", "q21_user_sessions",
        "q22_running_count", "q23_type_daily_stats", "q24_user_rolling_value",
        "q25_user_value_delta", "q26_asof_purchase_prior_view",
        "q27_sliding_2h_counts", "q28_promo_window_stats",
    ]
    # never driver-checked (registered after the r2 gate froze)
    + [
        "q91_stream_update_fold",
    ]
    # new this round (TPC-H Q17/Q18 adaptations, language-mixture balance,
    # resize plumbing under oracle)
    + [
        "q92_tpch_q17_small_qty", "q93_tpch_q18_large_orders",
        "q94_lang_balance", "q95_media_resize", "q96_sketch_rollup",
        "q97_asof_next_purchase",
    ]
    # stable non-events anchor re-greened with the spare slot (the other
    # dedup/similarity/tpch anchors already hold green rows from r03)
    + [
        "q08_tpch_q1",
    ]
)
_GATE = _ROUND4_GATE


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """This round's gate set (<= 50 entries, see rotation note above); every
    implemented operator from SURVEY.md §2 is in registry.all_specs()."""
    specs = registry.all_specs()
    missing = _GATE - set(specs)
    assert not missing, f"gate names drifted from registry: {missing}"
    return {
        name: spec.build
        for name, spec in sorted(specs.items())
        if name in _GATE
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted -> rows-only check)."""
    specs = registry.all_specs()
    return {
        name: spec.oracle
        for name, spec in sorted(specs.items())
        if name in _GATE and spec.oracle is not None
    }
