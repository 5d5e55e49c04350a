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
# (150 queries by end of round 5) remains verified by the in-repo mirror
# (tests/test_oracle_parity.py) at sf0.001 and the driver simulation in
# .claude/skills/verify at sf0.01.
# Round 5 rotates to (a) the 12 queries registered after the r4 gate froze
# (q98-q108, q110 -- implemented + mirror-verified but never driver-checked),
# (b) the 4 sketch queries, which this round gained full bound-check oracles
# (exact twin + within_bound booleans; see queries/sketches.py module
# docstring) and so flip from `no_oracle` rows-only to hash-match rows
# (q102 is already in set (a)), (c) the 22 queries whose ONLY green row is
# r1 -- recorded against the pre-regeneration dataset, re-proven here against
# current data, and (d) 13 r3-green entries that are either modified this
# round (q45/q46/q47 components probe-trim, q49 split-hash mask alignment)
# or bench headliners owed a fresh row (q41/q42/q44/q50/q54).
# Queries q121-q148 (TPC-H completion, CMS family, chunking/PII prep, DSIR
# weights, temperature/exact-k sampling, bitext mining, bigram LM, audits) were registered AFTER this gate froze:
# mirror-verified (sf0.001) and driver-simulated (sf0.01) this round, they
# rotate into the r6 gate.
_ROUND5_GATE = frozenset(
    # (a) never driver-checked
    [
        "q98_tpch_q7_nation_volume", "q99_tpch_q8_market_share",
        "q100_vocab_coverage", "q101_quantize_embeddings",
        "q102_stream_sketch_rollup", "q103_time_range_rolling",
        "q104_props_extract", "q105_activity_streaks",
        "q106_conversion_funnel", "q107_tpch_q15_top_supplier",
        "q108_tpch_q19_disjunctive", "q110_training_manifest",
    ]
    # (b) sketches, newly oracle-checkable
    + [
        "q70_approx_distinct_users", "q71_value_percentiles",
        "q96_sketch_rollup",
    ]
    # (c) only green row predates the r3 data regeneration
    + [
        "q08_tpch_q1_ref", "q09_tpch_q6", "q09b_order_revenue",
        "q10_wordcount", "q14_revenue_by_nation", "q15_top_customers",
        "q16_mktsegment_stats", "q17_orders_without_lineitems",
        "q18_tpch_q5_local_suppliers", "q19_tpch_q4_order_priority",
        "q19b_tpch_q14_promo_share", "q30_token_stats", "q31_quality_score",
        "q32_lang_id", "q33_fingerprint", "q34_regex_token_count",
        "q35_tfidf_top_terms", "q36_bigram_counts", "q37_repetition_ratio",
        "q39_corpus_select", "q40_exact_dedup", "q43_simhash",
    ]
    # (d) modified this round or bench headliners
    + [
        "q41_minhash_lsh_pairs", "q42_ngram_jaccard_pairs",
        "q44_simhash_neardup", "q45_dedup_clusters", "q46_dedup_keep_list",
        "q47_dedup_canonical_quality", "q49_train_split",
        "q50_knn_bruteforce", "q54_ivf_knn", "q62_tpch_q3",
        "q73_tpch_q13_order_distribution", "q77_unigram_logprob",
        "q89_tpch_q10_returned_items",
    ]
)
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
# Round-6 rotation: ALL 39 queries that have never received an external
# driver green row (q109, q111-q120 registered before the r5 gate froze but
# squeezed out; q121-q148 registered after it froze) — this converts the full
# 150-query registry to externally verified — plus 11 anchors: the queries
# MODIFIED this round (q45 swapped to the O(log n) two-phase component
# contraction, and q46/q47 which compose it; q128/q129/q134/q135/q142/q147
# are modified AND in the 39), the flagship q08, the r5 bench-regression
# watchlist q92/q93 re-greened under the fresh plans, and the oldest-green
# r4-era entries (q01/q57/q80/q86/q91) per the COVERAGE.md §gate policy:
# never-checked first, then oldest-green.
# Registered after this gate froze (mirror-verified + sf0.01 driver-
# simulated, rotate into r7): q149_source_caps, q150_covisit_pagerank,
# q151_covisit_communities, q152_weighted_sample, q153_inverted_index.
_ROUND6_GATE = frozenset(
    # (a) never driver-checked: pre-r5-gate stragglers
    [
        "q109_quantized_rescore_knn", "q111_span_dedup", "q112_semdedup_keep",
        "q113_retention_cohorts", "q114_quality_gate", "q115_tpch_q9_profit",
        "q116_stream_enrich_segments", "q117_bpe_pair_counts",
        "q118_bucketed_join_stats", "q119_index_assign_batch",
        "q120_lsh_quality_audit",
    ]
    # (a cont.) never driver-checked: registered after the r5 gate froze
    + [
        "q121_tpch_q2_min_cost_supplier", "q122_tpch_q11_important_parts",
        "q123_tpch_q12_late_priority", "q124_tpch_q16_supplier_count",
        "q125_tpch_q20_excess_shippers", "q126_tpch_q21_waiting_suppliers",
        "q127_cms_heavy_hitters", "q128_token_chunks",
        "q129_pii_scrub_audit", "q130_importance_weights",
        "q131_stream_cms_rollup", "q132_temperature_mixture",
        "q133_exact_k_per_lang", "q134_chunked_pack",
        "q135_bitext_mining", "q136_bigram_logprob",
        "q137_quality_expectations", "q138_day_completeness",
        "q139_cms_heavy_hitters_by_type", "q140_covisitation_pairs",
        "q141_robust_outliers", "q142_referential_integrity",
        "q143_daily_anomaly", "q144_dup_rate_by_source",
        "q145_ship_latency_quantiles", "q146_hourly_seasonality",
        "q147_value_concentration", "q148_signal_fusion",
    ]
    # (b) modified this round (two-phase components) + anchors
    + [
        "q45_dedup_clusters", "q46_dedup_keep_list",
        "q47_dedup_canonical_quality", "q08_tpch_q1",
        "q92_tpch_q17_small_qty", "q93_tpch_q18_large_orders",
        "q01_ride_count", "q57_kmeans", "q80_media_features",
        "q86_sequence_pack", "q91_stream_update_fold",
    ]
)
# Registered after this gate froze (mirror-verified + sf0.01 driver-
# simulated, rotate into r8): q154_ref_bundle_count_distinct,
# q155_ref_merge_divide_avg (reference-faithful approximate modes),
# q156_contrastive_triples (cluster-scoped hard-negative mining),
# q157_bm25_topk (Okapi BM25 ranked retrieval), q158_cdc_chunks
# (content-defined chunking, insertion-stable dedup unit),
# q159_bpe_train_merges (BPE tokenizer training, unrolled merge rounds),
# q160_chunk_novelty (incremental chunk-digest novelty audit),
# q161_stream_chunk_index (streamed CDC digest-index materialize),
# q162_pmi_collocations (PMI phrase mining), q163_user_ewma
# (order-dependent per-entity time-decay fold).
# Round-7 rotation (policy: COVERAGE.md §gate — never-checked first, then
# modified-since-last-green, then oldest-green, anchor q08 implicit via the
# r6 green row): (a) the 5 queries registered after the r6 gate froze
# (q149-q153, the only registry entries without an external green row);
# (b) q123, whose r6 red row was an oracle type-representation bug (DuckDB
# HUGEINT sum rendered float64) fixed this round with CAST(AS BIGINT) —
# values were already identical; (c) the queries MODIFIED in r6 after the
# gate froze — the robustness campaign touched q26/q97 (asof NULL
# semantics), q82 (fold NULL contract), q30/q31/q37 (empty-doc division),
# q148 (quantized cut grids), q71/q78/q113 (NULL filters), q81/q95 (media
# NULL ingestion; q80 already re-greened in r6), q88 (narrow-candidate
# multiprobe), and the ASCII fold touched every tokenization consumer —
# re-green the tokenization anchors q10/q33/q40/q41/q43; (d) the remaining
# 25 slots refill the oldest-green cohort: the r4-era rides/events entries
# q02-q07b/q11-q13/q20-q25/q27/q28 plus q58/q60/q61/q66-q69 (also r4),
# bounding worst-case green-row staleness at ~3 rounds.
_ROUND7_GATE = frozenset(
    # (a) never driver-checked (registered after the r6 gate froze)
    [
        "q149_source_caps", "q150_covisit_pagerank",
        "q151_covisit_communities", "q152_weighted_sample",
        "q153_inverted_index",
    ]
    # (b) red in r6 (oracle representation bug, fixed this round)
    + [
        "q123_tpch_q12_late_priority",
    ]
    # (c) modified in r6 after the gate froze (robustness campaign) +
    # tokenization anchors for the ASCII fold
    + [
        "q26_asof_purchase_prior_view", "q97_asof_next_purchase",
        "q82_generic_topn_fold", "q30_token_stats", "q31_quality_score",
        "q37_repetition_ratio", "q148_signal_fusion",
        "q71_value_percentiles", "q78_value_deciles",
        "q113_retention_cohorts", "q81_frame_samples", "q95_media_resize",
        "q88_embed_neardup_multiprobe", "q10_wordcount", "q33_fingerprint",
        "q40_exact_dedup", "q41_minhash_lsh_pairs", "q43_simhash",
    ]
    # (d) oldest-green refill (r4-era rows)
    + [
        "q02_ride_count_distinct", "q03_ride_avg_passengers",
        "q04_ride_multi_avg", "q05_ride_max_passengers",
        "q06_ride_sum_passengers", "q07_top10_distances",
        "q07b_topn_per_driver", "q11_global_avg_distance",
        "q12_grid_cell_counts", "q13_driver_fare_stats",
        "q20_tumbling_hourly", "q21_user_sessions", "q22_running_count",
        "q23_type_daily_stats", "q24_user_rolling_value",
        "q25_user_value_delta", "q27_sliding_2h_counts",
        "q28_promo_window_stats", "q58_diversity_sample",
        "q60_salted_type_counts", "q61_sql_count_distinct",
        "q66_purchasers_with_errors", "q67_viewers_never_purchased",
        "q68_salted_distinct_users", "q69_grouping_sets",
    ]
    # flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
)
# Round-8 rotation (policy: COVERAGE.md §gate): (a) the 24 never-checked
# entries — the 10 round-7 additions q154-q163, the planted positive-path
# twins q164/q67b/q74b (which exist precisely so the external gate finally
# hash-matches NON-EMPTY results for the near-dup / EXCEPT / anti-join paths
# whose every prior green row was a 0-row match — VERDICT r7 "vacuous
# greens"), and the round-8 additions q167-q174 (controller transcript, BPE
# encode, semantic decontamination, symspell fuzzy join, hybrid rerank,
# media dedup stats, fertility, boilerplate prefixes), q175 (dataset
# token report), q176 (point-in-time training features), and q177
# (deterministic negative sampling); (b) the oldest-green
# cohorts in full — all 13 entries whose last green row is r3 (incl.
# q53/q74, the vacuous originals; q53 also refactored this round into the
# shared _neardup_pairs_df body) and all 8 r4-era entries; (c) the flagship
# q08 anchor; (d) 4 r5-era refill slots, bench headliners first (q50,
# q54, q77, q99 — q08_ref/q09/q09b/q14/q18/q35/q39/q42/q44/q62/q73 yielded
# their slots to the never-checked additions as they landed). Worst-case
# green-row staleness after this round: r5 (the 34 remaining r5-era rows
# rotate into r9 first).
_ROUND8_GATE = frozenset(
    # (a) never driver-checked
    [
        "q154_ref_bundle_count_distinct", "q155_ref_merge_divide_avg",
        "q156_contrastive_triples", "q157_bm25_topk", "q158_cdc_chunks",
        "q159_bpe_train_merges", "q160_chunk_novelty",
        "q161_stream_chunk_index", "q162_pmi_collocations", "q163_user_ewma",
        "q164_embed_neardup_planted", "q67b_viewers_no_big_purchase",
        "q74b_tpch_q22_planted", "q167_controller_transcript",
        "q168_bpe_encode", "q169_embed_decontaminate", "q170_symspell_pairs",
        "q171_hybrid_rerank", "q172_media_dedup_stats",
        "q173_bpe_fertility_by_lang", "q174_boilerplate_prefixes",
        "q175_dataset_token_report", "q176_pit_training_features",
        "q177_negative_samples",
    ]
    # (b) oldest green rows: the full r3-era cohort...
    + [
        "q38_deterministic_sample", "q48_contamination",
        "q51_lsh_bucket_top_pairs", "q52_label_centroids",
        "q53_embed_neardup_pairs", "q55_ivf_knn_nprobe2",
        "q56_hybrid_search", "q59_incremental_neardup",
        "q63_rollup_flag_status", "q64_pivot_linestatus", "q65_big_orders",
        "q74_tpch_q22_idle_rich", "q75_cube_flag_status",
    ]
    # ...and the full r4-era cohort
    + [
        "q72_exact_percentiles", "q76_purchase_error_reconcile",
        "q83_stream_incremental_mv", "q84_stream_view_purchase_join",
        "q85_stream_sessions", "q87_greedy_pack", "q90_stream_dedup",
        "q94_lang_balance",
    ]
    # (c) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (d) r5-era refill, bench headliners first (q62 yielded its slot to
    # q167, the controller-law transcript, q09b to q168 the BPE corpus
    # encoder, q08_ref/q39 to q169 decontamination and q170 the symmetric-
    # delete fuzzy join — never-checked beats refill)
    + [
        "q50_knn_bruteforce", "q54_ivf_knn",
        "q77_unigram_logprob", "q99_tpch_q8_market_share",
    ]
)
# Round 9 drains the rotation debt: after r8 the ONLY entries whose newest
# green row predates r6 are the 34 r5-era rows below (tier 3, oldest-green)
# — re-greening them makes every registry entry's newest external green row
# r6+ for the first time since the gate began. Tier 2 (modified since green):
# q177, whose candidate hash was remapped onto [1, n_parts] this round
# (ADVICE r8 — key 0 was unsampleable and partkey n_parts excluded). The
# round-9 additions (tier 1, never checked) fill the remaining slots as they
# land.
_ROUND9_GATE = frozenset(
    # (a) never driver-checked: round-9 additions (all registered — the gate
    # assert below holds strictly again)
    [
        "q178_quality_classifier", "q179_unigram_lm_tokenizer",
        "q180_shard_export", "q181_zorder_pruning_stats",
        "q182_classifier_gated_corpus", "q183_tokenizer_ablation",
        "q184_stream_classifier_scores", "q185_epoch_repetition",
        "q186_needle_eval_samples", "q187_decontamination_report",
    ]
    # (b) modified since last green row
    + [
        "q177_negative_samples",
    ]
    # (c) oldest-green: the full r5-era cohort (34)
    + [
        "q08_tpch_q1_ref", "q09_tpch_q6", "q09b_order_revenue",
        "q100_vocab_coverage", "q101_quantize_embeddings",
        "q102_stream_sketch_rollup", "q103_time_range_rolling",
        "q104_props_extract", "q105_activity_streaks",
        "q106_conversion_funnel", "q107_tpch_q15_top_supplier",
        "q108_tpch_q19_disjunctive", "q110_training_manifest",
        "q14_revenue_by_nation", "q15_top_customers", "q16_mktsegment_stats",
        "q17_orders_without_lineitems", "q18_tpch_q5_local_suppliers",
        "q19_tpch_q4_order_priority", "q19b_tpch_q14_promo_share",
        "q32_lang_id", "q34_regex_token_count", "q35_tfidf_top_terms",
        "q36_bigram_counts", "q39_corpus_select", "q42_ngram_jaccard_pairs",
        "q44_simhash_neardup", "q49_train_split", "q62_tpch_q3",
        "q70_approx_distinct_users", "q73_tpch_q13_order_distribution",
        "q89_tpch_q10_returned_items", "q96_sketch_rollup",
        "q98_tpch_q7_nation_volume",
    ]
    # (d) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (e) spare-slot refill per the standing policy: after (a)-(d) the gate
    # held 46, so the 4 OLDEST r6-era greens (name order) take the free
    # slots — advancing the next-oldest cohort's rotation a round early
    + [
        "q01_ride_count", "q109_quantized_rescore_knn",
        "q111_span_dedup", "q112_semdedup_keep",
    ]
)
# Round 10 drains the ENTIRE remaining r6-era cohort (42 entries — the
# oldest-green tier after r9 left nothing older than r6), plus the four
# round-10 additions and the two builders whose data path changed this round
# (q161/q184 stream feeds now route through load_table normalization; the
# six gate builders that only swapped mkdtemp for the bounded gate_workdir
# were re-verified by this round's driver simulation and keep their rows).
# After this round every registry entry's newest external green is r7+.
_ROUND10_GATE = frozenset(
    # (a) never driver-checked: round-10 additions
    [
        "q156b_contrastive_pool", "q188_substring_dedup",
        "q189_runner_decision_trace", "q190_trained_langid",
    ]
    # (b) modified since last green row (stream feed normalization)
    + [
        "q161_stream_chunk_index", "q184_stream_classifier_scores",
    ]
    # (c) oldest-green: the full r6-era cohort (42)
    + [
        "q114_quality_gate", "q115_tpch_q9_profit",
        "q116_stream_enrich_segments", "q117_bpe_pair_counts",
        "q118_bucketed_join_stats", "q119_index_assign_batch",
        "q120_lsh_quality_audit", "q121_tpch_q2_min_cost_supplier",
        "q122_tpch_q11_important_parts", "q124_tpch_q16_supplier_count",
        "q125_tpch_q20_excess_shippers", "q126_tpch_q21_waiting_suppliers",
        "q127_cms_heavy_hitters", "q128_token_chunks",
        "q129_pii_scrub_audit", "q130_importance_weights",
        "q131_stream_cms_rollup", "q132_temperature_mixture",
        "q133_exact_k_per_lang", "q134_chunked_pack", "q135_bitext_mining",
        "q136_bigram_logprob", "q137_quality_expectations",
        "q138_day_completeness", "q139_cms_heavy_hitters_by_type",
        "q140_covisitation_pairs", "q141_robust_outliers",
        "q142_referential_integrity", "q143_daily_anomaly",
        "q144_dup_rate_by_source", "q145_ship_latency_quantiles",
        "q146_hourly_seasonality", "q147_value_concentration",
        "q45_dedup_clusters", "q46_dedup_keep_list",
        "q47_dedup_canonical_quality", "q57_kmeans", "q80_media_features",
        "q86_sequence_pack", "q91_stream_update_fold",
        "q92_tpch_q17_small_qty", "q93_tpch_q18_large_orders",
    ]
    # (d) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (e) spare-slot refill: one slot left after (a)-(d); it goes to q83,
    # the first-named of the workdir-touched stream gates
    + [
        "q83_stream_incremental_mv",
    ]
)
# Registered AFTER the r11 gate froze (mirror-verified at sf0.001 AND
# sf0.01, full-registry driver simulation green; rotate into r12 as the
# never-checked tier): q203 stream-side IVF-PQ search, q204 embedding-drift
# TV audit, q205 stream-side incremental substring dedup, q206
# bloom-prefiltered substring dedup, q207 key-skew profile, q208
# join-explosion audit, q209 source-overlap matrix, q210 leakage-safe
# split, q211 retrieval-MRR audit, q212 incremental split assignment, q213
# stream-side split assignment, q214 impact-capped retrieval recall audit,
# q215 split-leakage audit, q216 per-source quality gate, q217 batch
# novelty rate, q218 KMV overlap sketch, q219 stream novelty counters,
# q220 preference pairs, q221 index-selection report, q222 classifier
# calibration, q223 index nDCG audit, q224 cluster-size audit, q225
# packing-efficiency scorecard, q226 dataset-version diff, q227
# length-bucketed batches, q228 mixture-shift report, q229
# embedding-norm audit.
# Builders modified
# after the freeze (r12 tier 2): q43 (simhash_rows extraction), q202 (the
# shared-oracle constant + _substr_grams extra-column signature), q45/q46
# unchanged in semantics but upstream of the new split family.
# Round 11 drains (a) the 12 never-checked entries — the nine post-r10-freeze
# additions q191-q199 plus this round's q200 IVF-PQ, q201 its recall audit,
# and q202 incremental substring dedup — then (b) the 8 builders modified
# since their newest green (q189 summary-gate rewrite, q190 size-gated margin
# broadcast, q188 shared-gram refactor, q54/q55 probe-helper extraction,
# q110/q168/q175 memoized constituent artifacts), (c) the flagship anchor,
# and (d) 29 of the 49-entry r7-era oldest-green cohort in name order — the
# remaining 20 (q31..q97, see COVERAGE.md) rotate into r12 with their r7
# rows intact. q156's bench-flag demotion is metadata-only (builder and
# oracle untouched) and does not re-gate it.
_ROUND11_GATE = frozenset(
    # (a) never driver-checked
    [
        "q191_gopher_repetition", "q192_curation_funnel",
        "q193_source_drift_ks", "q194_dim_truncation_recall",
        "q195_pq_codes", "q196_pq_adc_knn", "q197_pq_recall",
        "q198_stream_pq_codes", "q199_stream_adc_search",
        "q200_ivfpq_knn", "q201_ivfpq_recall",
        "q202_incremental_substring_dedup",
    ]
    # (b) modified since last green row (this round)
    + [
        "q188_substring_dedup", "q189_runner_decision_trace",
        "q190_trained_langid", "q54_ivf_knn", "q55_ivf_knn_nprobe2",
        "q110_training_manifest", "q168_bpe_encode",
        "q175_dataset_token_report",
    ]
    # (c) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (d) oldest-green: r7-era cohort, name order, first 29 of 49
    + [
        "q02_ride_count_distinct", "q03_ride_avg_passengers",
        "q04_ride_multi_avg", "q05_ride_max_passengers",
        "q06_ride_sum_passengers", "q07_top10_distances",
        "q07b_topn_per_driver", "q10_wordcount", "q113_retention_cohorts",
        "q11_global_avg_distance", "q123_tpch_q12_late_priority",
        "q12_grid_cell_counts", "q13_driver_fare_stats",
        "q148_signal_fusion", "q149_source_caps", "q150_covisit_pagerank",
        "q151_covisit_communities", "q152_weighted_sample",
        "q153_inverted_index", "q20_tumbling_hourly", "q21_user_sessions",
        "q22_running_count", "q23_type_daily_stats", "q24_user_rolling_value",
        "q25_user_value_delta", "q26_asof_purchase_prior_view",
        "q27_sliding_2h_counts", "q28_promo_window_stats", "q30_token_stats",
    ]
)
# Registered AFTER the r12 gate froze (mirror-verified at sf0.001 and
# sf0.01; rotate into r13 as the never-checked tier): q230 token-budget
# data selection (two-phase distributed prefix sum), q231 per-source PSI
# drift audit (bias-corrected, the binned complement of q193's KS), q232
# stream-emitted PSI monitor (per-epoch mergeable histograms, q231's
# serving face), q233 weighted exact-k sample without replacement
# (Efraimidis-Spirakis over portable hash uniforms), q234 stratified
# quota sample (proportional allocation, largest-remainder seating), q235
# stream-maintained weighted sample index (per-epoch mergeable top-k
# generations, q233's serving face), q236 SCD2 effective-dated dimension
# build from the event log, q237 incremental SCD2 merge (the MERGE INTO
# pattern, gated to equal q236's full rebuild), q238 temporal
# point-in-time join against the SCD2 dimension (Flink's FOR SYSTEM_TIME
# AS OF, run as the as-of carry), q239 its streaming face (per-micro-batch
# as-of against the persisted dimension, gated to equal the batch join),
# q240 erasure manifest (right-to-be-forgotten with near-dup closure —
# a deleted doc's whole cluster purges, so content cannot survive via its
# simhash copies or its kept canonical), q241 CCNet reference-trained LM
# cross-entropy scoring (per-language bigram LM trained on the curated
# slice, <unk>-mapped OOV), q242 its head/middle/tail equal-population
# tercile partition, q243 curriculum-ordered training manifest (staged by
# q242's terciles, seeded within-stage permutation, two-phase positions),
# q244 the streaming scoring face (frozen LM artifacts probed per
# micro-batch, gated to the batch scorer), q245 fill-in-the-middle sample
# construction (seeded PSM splits, zero-shuffle scan), q246
# curriculum-ordered context-window packing (q86's law in q243's order),
# q247 DoReMi-lite domain reweighting (excess cross-entropy ->
# exponential weights), q248 at-the-door curriculum stage assignment
# (corpus-frozen LM + O(1)-per-language tercile cuts), q249 its streaming
# face (gated to q248's batch relation), q250 exact n-gram phrase search
# (adjacency grams filtered to the fixed phrase workload — no positional
# self-join), q251 boilerplate-stripped corpus emission (the cleaning
# transform composing q174's detector; before/after token accounting and
# cleaned-content fingerprints), q252 content-addressed media chunk
# manifest (fixed-size payload chunks with per-chunk digests — the
# multipart-upload/replica-audit plan, zero-shuffle scan), q253
# per-worker dataloader manifest over the curriculum windows (contiguous
# window ranges per worker with load + stage-span accounting), q254
# multi-epoch token schedule (DoReMi weights -> per-source targets/epochs
# with the data-constrained repeat cap), q255 stream-side boilerplate
# strip (frozen flagged-prefix artifact probed per micro-batch, batch-side
# planted positives, gated to the batch transform).
# Round 12 drains the whole remaining verification debt (VERDICT r11 #1-#3):
# (a) the 27 never-driver-checked post-r11-freeze additions q203-q229 — the
# streaming serving tier (q203/q205/q213/q219), the split-leakage family
# (q210-q215), and the audit scorecards (q216-q229); (b) the 4 builders
# modified since their newest green — q43 (simhash_rows extraction), q202
# (shared-oracle constant + _substr_grams signature), q45/q46 (this round's
# shared-artifact memoization, VERDICT r11 #4 — also upstream of the split
# family); (c) the flagship anchor; (d) 18 of the 19 remaining r7-era
# oldest-green entries in name order — q97_asof_next_purchase is the single
# slot casualty and rotates into r13 with its r7 row intact. q47/q110/q224
# consume the newly-memoized q45 relation but their own builders are
# unchanged and the full sf0.01 driver simulation re-proved them this
# session (the r10 infra-swap precedent); q110 keeps its r11 row, q47 its
# r10 row, q224 gates in (a) anyway.
_ROUND12_GATE = frozenset(
    # (a) never driver-checked (post-r11-freeze registrations)
    [
        "q203_stream_ivfpq_search", "q204_embedding_drift_tv",
        "q205_stream_substring_dedup", "q206_bloom_substring_dedup",
        "q207_key_skew_profile", "q208_join_explosion_audit",
        "q209_source_overlap_matrix", "q210_leakage_safe_split",
        "q211_retrieval_mrr", "q212_incremental_split_assign",
        "q213_stream_split_assign", "q214_retrieval_mrr_capped",
        "q215_split_leakage_audit", "q216_per_source_quality_gate",
        "q217_batch_novelty_by_source", "q218_source_overlap_kmv",
        "q219_stream_novelty_counters", "q220_preference_pairs",
        "q221_index_selection_report", "q222_classifier_calibration",
        "q223_index_ndcg_audit", "q224_cluster_size_audit",
        "q225_packing_efficiency", "q226_dataset_version_diff",
        "q227_length_bucket_batches", "q228_mixture_shift_report",
        "q229_embedding_norm_audit",
    ]
    # (b) modified since last green row
    + [
        "q43_simhash", "q202_incremental_substring_dedup",
        "q45_dedup_clusters", "q46_dedup_keep_list",
    ]
    # (c) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (d) oldest-green: r7-era tail, name order, 18 of the remaining 19
    + [
        "q31_quality_score", "q33_fingerprint", "q37_repetition_ratio",
        "q40_exact_dedup", "q41_minhash_lsh_pairs", "q58_diversity_sample",
        "q60_salted_type_counts", "q61_sql_count_distinct",
        "q66_purchasers_with_errors", "q67_viewers_never_purchased",
        "q68_salted_distinct_users", "q69_grouping_sets",
        "q71_value_percentiles", "q78_value_deciles", "q81_frame_samples",
        "q82_generic_topn_fold", "q88_embed_neardup_multiprobe",
        "q95_media_resize",
    ]
)

# Round 13 drains the whole remaining verification debt (VERDICT r12 #1-#2):
# (a) the 26 never-driver-checked post-r12-freeze registrations q230-q255 —
# token-budget selection, PSI drift + streaming monitor, the sampler tier
# (weighted/stratified/streaming), the SCD2/temporal family, erasure
# manifest, the CCNet LM-scoring family (batch/buckets/streaming), the
# curriculum tier (order/pack/stage + streaming + FIM + worker manifests),
# DoReMi reweighting + token schedule, exact phrase search, boilerplate
# strip (batch + streaming), and the media chunk manifest; (b)
# q97_asof_next_purchase, the r12 rotation casualty (last green r7); (c)
# the builders modified since their newest green — the ANN-audit consumers
# q197/q201 (r12 constituent memoization landed after their r11 rows) plus
# q221/q223/q224 re-greened per the r12 judge's explicit ask (their r12
# rows postdate the memoization, but the brief names them; they double as
# the audit-tier anchors); q237/q230/q246/q244 are already inside tier (a);
# (d) the flagship anchor; (e) 17 of the 42 remaining r8-era oldest-green
# entries in name order — after this round the oldest green anywhere in
# the registry is r8 (25 entries), bounding staleness at <= 5 rounds.
# Registered after this gate froze (mirror-verified + sf0.01 driver-
# simulated, rotate into r14): q256_phrase_postings_probe — q250's
# persisted-postings incremental face under q250's own oracle;
# q257_unimax_allocation — the UniMax per-language waterfill (Chung 2023)
# beside the DoReMi tier; q258_stream_phrase_postings — the rolling-ingest
# serving face of q256 (partial postings epochs, kill/recovery-tested)
# under q250's oracle; q259_window_doc_spans — the packed-attention mask
# manifest composed from q246 (per-window document spans);
# q260_media_caption_gate — LAION-style image-caption alignment-gate
# plumbing (deterministic stub score, real join/gate/accounting);
# q261_batch_mixture_schedule — the UniMax allocation apportioned over
# global batches by the all-integer cumulative-floor (Bresenham) law;
# q262_stream_media_caption_gate — q260's serving face (per-micro-batch
# pair gating, kill/recovery-tested) under q260's oracle;
# q263_split_repair_manifest — the eval-refresh repair list (q48's
# contamination x q210's sides -> drop/keep actions with token cost);
# q264_source_bradley_terry — arena-style Bradley-Terry source-strength
# fit (Hunter 2004 MM, driver-side bounded solve over the distributed
# pair matrix — the lloyd_kmeans topology); q265_heaps_law_curve — the
# power-of-two-prefix vocabulary-growth audit (exact integer octave law);
# q266_group_advantage — GRPO group-relative advantage normalization
# (Shao 2024) of the q77 quality score within (source, lang) cohorts;
# q267_zipf_law_fit — the Zipf rank-frequency OLS fit (slope/intercept/r2
# in one row), companion corpus-law audit to q265's Heaps curve.
_ROUND13_GATE = frozenset(
    # (a) never driver-checked (post-r12-freeze registrations)
    [
        "q230_token_budget_select", "q231_psi_drift", "q232_stream_psi_monitor",
        "q233_weighted_sample_topk", "q234_stratified_quota_sample",
        "q235_stream_weighted_sample", "q236_scd2_user_dimension",
        "q237_scd2_incremental_merge", "q238_temporal_state_join",
        "q239_stream_temporal_enrich", "q240_erasure_manifest",
        "q241_ccnet_lm_score", "q242_ccnet_ppl_buckets",
        "q243_curriculum_order", "q244_stream_ccnet_score",
        "q245_fim_samples", "q246_curriculum_pack",
        "q247_domain_reweight", "q248_curriculum_stage_assign",
        "q249_stream_curriculum_stage", "q250_phrase_search",
        "q251_boilerplate_strip", "q252_media_chunk_manifest",
        "q253_curriculum_worker_manifest", "q254_token_schedule",
        "q255_stream_boilerplate_strip",
    ]
    # (b) the r12 rotation casualty (oldest green anywhere: r7)
    + [
        "q97_asof_next_purchase",
    ]
    # (c) modified since (or re-greened per the r12 brief's explicit list)
    + [
        "q197_pq_recall", "q201_ivfpq_recall", "q221_index_selection_report",
        "q223_index_ndcg_audit", "q224_cluster_size_audit",
    ]
    # (d) flagship anchor (every round)
    + [
        "q08_tpch_q1",
    ]
    # (e) oldest-green: r8-era tier, name order, 17 of the remaining 42
    + [
        "q154_ref_bundle_count_distinct", "q155_ref_merge_divide_avg",
        "q156_contrastive_triples", "q157_bm25_topk", "q158_cdc_chunks",
        "q159_bpe_train_merges", "q160_chunk_novelty",
        "q162_pmi_collocations", "q163_user_ewma",
        "q164_embed_neardup_planted", "q167_controller_transcript",
        "q169_embed_decontaminate", "q170_symspell_pairs",
        "q171_hybrid_rerank", "q172_media_dedup_stats",
        "q173_bpe_fertility_by_lang", "q174_boilerplate_prefixes",
    ]
)

_GATE = _ROUND13_GATE


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
