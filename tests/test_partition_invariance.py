"""Partitioning invariance: the determinism contract behind every oracle
check — a query's RESULT SET may not depend on spark.sql.shuffle.partitions
(merge order, task count, or which executor saw a row first).

A representative query from each family runs under the default layout and
again under a hostile prime partition count; the collected row sets must be
identical. Queries with documented float-rounding discipline compare on the
rounded values they emit, which is exactly what the driver hashes."""

from __future__ import annotations

import pytest

from flink_adcom_spark.registry import get

# one per family: agg, window, join, dedup-LSH, components, sampling, sketch
# bound flags, packing prefix-sum, similarity rank, CMS, TPC-H decorrelation
CASES = [
    "q01_ride_count",
    "q07b_topn_per_driver",
    "q26_asof_purchase_prior_view",
    "q41_minhash_lsh_pairs",
    "q45_dedup_clusters",
    "q86_sequence_pack",
    "q94_lang_balance",
    "q127_cms_heavy_hitters",
    "q130_importance_weights",
    "q132_temperature_mixture",
    "q133_exact_k_per_lang",
    "q126_tpch_q21_waiting_suppliers",
    "q134_chunked_pack",
    "q135_bitext_mining",
    "q136_bigram_logprob",
    "q139_cms_heavy_hitters_by_type",
    "q141_robust_outliers",
    "q143_daily_anomaly",
    "q144_dup_rate_by_source",
    "q147_value_concentration",
    # round-12 additions: the banded prefix sum's band/window split, the
    # float-keyed ES top-k's membership, the largest-remainder seating, and
    # the as-of carry against equal-timestamp SCD2 versions are exactly the
    # shapes where a shuffle-layout dependence would hide
    "q230_token_budget_select",
    "q231_psi_drift",
    "q233_weighted_sample_topk",
    "q234_stratified_quota_sample",
    "q236_scd2_user_dimension",
    "q237_scd2_incremental_merge",
    "q238_temporal_state_join",
]


def _rows(spark, name, sf_dir):
    df = get(name).build(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", CASES)
def test_result_set_is_partitioning_invariant(spark, sf_dir, name):
    default = spark.conf.get("spark.sql.shuffle.partitions")
    base = _rows(spark, name, sf_dir)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        hostile = _rows(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == hostile, f"{name}: result depends on shuffle layout"
    assert base, f"{name}: empty result proves nothing"
