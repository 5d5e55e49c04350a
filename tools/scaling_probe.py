#!/usr/bin/env python3
"""Empirical scaling audit: run the scale-critical operators at every
available SF (a 100x input span) and record wall time + output rows, so the
"this survives a scale-up" claims in PLANS.md carry measured curves instead
of assertions. A banded/capped operator should grow ~linearly in input size;
an accidental all-pairs would show quadratic output growth.

Run: python tools/scaling_probe.py  (writes SCALING.md at the repo root)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_adcom_spark import registry
from flink_adcom_spark.session import get_spark

SFS = ["0.001", "0.01", "0.1", "1"]
# sf1 is a synthetic 10x-sf0.1 corpus (documents + embeddings only) generated
# by tools/make_sf1.py into /tmp — /root/testdata is read-only. Only the
# operators whose 100x story carries quadratic-family risk run there: the
# cluster-scoped quadratics (derived k leaves its floor at N=20k: k=18), the
# CC closure, the vocabulary-bound encoders, and the salted folds.
SF_DIRS = {sf: f"/root/testdata/sf{sf}" for sf in SFS[:3]}
SF_DIRS["1"] = "/tmp/spark_graft_sf1"
SF1_PROBES = frozenset([
    "q156_contrastive_triples", "q112_semdedup_keep", "q57_kmeans",
    "q45_dedup_clusters", "q168_bpe_encode", "q179_unigram_lm_tokenizer",
    "q153_inverted_index", "q149_source_caps", "q152_weighted_sample",
    "q178_quality_classifier", "q180_shard_export", "q183_tokenizer_ablation",
    "q186_needle_eval_samples",
    # round-10: the pool-bounded q156 successor must show ~linear wall; the
    # composed/flat-cost operators prove their vocabulary-/pool-boundness
    # holds at 10x (VERDICT r9 #7)
    "q156b_contrastive_pool", "q175_dataset_token_report",
    "q110_training_manifest", "q187_decontamination_report",
    "q188_substring_dedup", "q191_gopher_repetition", "q192_curation_funnel",
    "q193_source_drift_ks", "q194_dim_truncation_recall",
    "q195_pq_codes", "q196_pq_adc_knn",
    # round-11: the IVF-PQ composition's whole claim is sub-linear per-query
    # cost vs q196's flat scan at the 10x tier; q202's is per-batch cost
    "q200_ivfpq_knn", "q202_incremental_substring_dedup",
    # round-11 session 2: the bloom prefilter must hold q206 at-or-below
    # q202's per-batch wall at 10x; q209's pair join is bounded by
    # sources-per-gram; q210 must add ~nothing over q45's contraction
    "q206_bloom_substring_dedup", "q209_source_overlap_matrix",
    "q210_leakage_safe_split",
    # q214's capped searcher must stay bounded at the tier where q211's
    # exact eval is deliberately left unprobed (the 2.75e9-row worst case);
    # q212's per-batch probe must stay ~flat vs q210's full contraction
    "q212_incremental_split_assign", "q214_retrieval_mrr_capped",
    # the leakage audit rides the contraction; the KMV sketch must hold its
    # bounded-state shape at the duplicate-heavy 10x corpus
    "q215_split_leakage_audit", "q218_source_overlap_kmv",
    # round-12: the banded prefix sum and the bin-bounded PSI at 10x; the
    # samplers' bounded folds
    "q230_token_budget_select", "q231_psi_drift",
    "q233_weighted_sample_topk", "q234_stratified_quota_sample",
    # round-12 session 2: the CCNet scorer's token-linear claim (one scan +
    # LM equi-joins) and the curriculum's prefix-count law at 10x; the FIM
    # transform's zero-shuffle scan and the curriculum packing's cell law
    "q241_ccnet_lm_score", "q243_curriculum_order",
    "q245_fim_samples", "q246_curriculum_pack", "q250_phrase_search",
    "q251_boilerplate_strip", "q252_media_chunk_manifest",
    # round-13: per-batch postings-merge cost at the 10x corpus; the SCD2
    # merge's O(batch + open versions) and the temporal join at 10x users
    # (make_sf1.py now replicates events with fresh user ranges)
    "q256_phrase_postings_probe", "q237_scd2_incremental_merge",
    "q238_temporal_state_join",
])
# the operators whose scale shape this round changed or added
PROBES = [
    "q206_bloom_substring_dedup",
    "q207_key_skew_profile",
    "q208_join_explosion_audit",
    "q209_source_overlap_matrix",
    "q210_leakage_safe_split",
    "q211_retrieval_mrr",
    "q212_incremental_split_assign",
    "q214_retrieval_mrr_capped",
    "q215_split_leakage_audit",
    "q216_per_source_quality_gate",
    "q217_batch_novelty_by_source",
    "q218_source_overlap_kmv",
    "q220_preference_pairs",
    "q221_index_selection_report",
    "q222_classifier_calibration",
    "q223_index_ndcg_audit",
    "q224_cluster_size_audit",
    "q225_packing_efficiency",
    "q226_dataset_version_diff",
    "q227_length_bucket_batches",
    "q228_mixture_shift_report",
    "q229_embedding_norm_audit",
    "q40_exact_dedup",
    "q41_minhash_lsh_pairs",
    "q44_simhash_neardup",
    "q45_dedup_clusters",
    "q51_lsh_bucket_top_pairs",
    "q53_embed_neardup_pairs",
    "q88_embed_neardup_multiprobe",
    "q86_sequence_pack",
    "q89_tpch_q10_returned_items",
    "q92_tpch_q17_small_qty",
    "q93_tpch_q18_large_orders",
    "q94_lang_balance",
    # round-5 additions with explicit scale claims to back empirically
    "q109_quantized_rescore_knn",
    "q111_span_dedup",
    "q112_semdedup_keep",
    "q115_tpch_q9_profit",
    # round-5 continuation: TPC-H completion + prep/sketch additions
    "q126_tpch_q21_waiting_suppliers",
    "q127_cms_heavy_hitters",
    "q128_token_chunks",
    "q130_importance_weights",
    "q134_chunked_pack",
    "q135_bitext_mining",
    "q136_bigram_logprob",
    "q139_cms_heavy_hitters_by_type",
    "q140_covisitation_pairs",
    "q143_daily_anomaly",
    "q148_signal_fusion",
    # round-6 additions: caps/sampling folds, graph loops, index build
    "q149_source_caps",
    "q150_covisit_pagerank",
    "q151_covisit_communities",
    "q152_weighted_sample",
    "q153_inverted_index",
    # round-7 additions: ref-faithful modes, contrastive mining, retrieval
    "q154_ref_bundle_count_distinct",
    "q155_ref_merge_divide_avg",
    "q156_contrastive_triples",
    "q157_bm25_topk",
    "q158_cdc_chunks",
    "q159_bpe_train_merges",
    "q160_chunk_novelty",
    "q162_pmi_collocations",
    "q163_user_ewma",
    # round-8 additions: planted near-dup twin, BPE encoding, semantic
    # decontamination, fuzzy join, hybrid rerank
    "q164_embed_neardup_planted",
    "q168_bpe_encode",
    "q169_embed_decontaminate",
    "q170_symspell_pairs",
    "q171_hybrid_rerank",
    "q172_media_dedup_stats",
    "q175_dataset_token_report",
    "q176_pit_training_features",
    "q177_negative_samples",
    # round-9 additions: trained classifier, unigram-LM tokenizer, shard export
    "q57_kmeans",
    "q178_quality_classifier",
    "q179_unigram_lm_tokenizer",
    "q180_shard_export",
    "q183_tokenizer_ablation",
    "q185_epoch_repetition",
    "q186_needle_eval_samples",
    # round-10 additions
    "q110_training_manifest",
    "q156b_contrastive_pool",
    "q187_decontamination_report",
    "q188_substring_dedup",
    "q191_gopher_repetition",
    "q192_curation_funnel",
    "q193_source_drift_ks",
    "q194_dim_truncation_recall",
    "q195_pq_codes",
    "q196_pq_adc_knn",
    "q197_pq_recall",
    # round-11 additions
    "q200_ivfpq_knn",
    "q201_ivfpq_recall",
    "q202_incremental_substring_dedup",
    # round-12 additions: budget selection's banded prefix sum must stay
    # window-bounded; the PSI audit must stay |sources| x bins flat; the
    # samplers must keep their bounded-fold / stratum-grid shapes
    "q230_token_budget_select",
    "q231_psi_drift",
    "q233_weighted_sample_topk",
    "q234_stratified_quota_sample",
    "q236_scd2_user_dimension",
    "q237_scd2_incremental_merge",
    "q238_temporal_state_join",
    # round-12 session 2: reference-trained LM family — the scorer must be
    # token-linear, the tercile/curriculum compositions must add only the
    # rank/prefix-count stages over the memoized score relation
    "q241_ccnet_lm_score",
    "q242_ccnet_ppl_buckets",
    "q243_curriculum_order",
    "q245_fim_samples",
    "q246_curriculum_pack",
    "q247_domain_reweight",
    "q248_curriculum_stage_assign",
    "q250_phrase_search",
    "q251_boilerplate_strip",
    "q252_media_chunk_manifest",
    "q253_curriculum_worker_manifest",
    "q254_token_schedule",
    # round-13: the persisted-postings merge must stay bounded by batch
    # hits + workload hit volume, never corpus size
    "q256_phrase_postings_probe",
    # round-13 session 2: the waterfill must stay |languages|-bounded, the
    # mask manifest windows-per-doc-bounded, the caption gate join+scan,
    # the batch schedule |languages| x batches arithmetic
    "q257_unimax_allocation", "q259_window_doc_spans",
    "q260_media_caption_gate", "q261_batch_mixture_schedule",
    # round-13 session 3: the BT fit must stay pair-matrix-bounded after
    # the distributed reduce, the Heaps curve octave-join-bounded, the
    # GRPO normalization one moment-agg + broadcast over the scan
    "q264_source_bradley_terry", "q265_heaps_law_curve",
    "q266_group_advantage",
    # ... and the Zipf fit must stay vocabulary-bounded (rank window + one
    # five-moment global agg)
    "q267_zipf_law_fit",
]


def _parse_prev_rows() -> dict[str, dict[str, tuple[float, int]]]:
    """Recover the measured cells from the existing SCALING.md table, so a
    restricted run (argv query names) re-measures only those queries and
    keeps everyone else's rows."""
    import re

    out: dict[str, dict[str, tuple[float, int]]] = {}
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            if line.startswith("## "):
                break  # hand-written analysis sections also contain q-rows
            m = re.match(r"\| (q\w+) \| (.*) \|$", line.strip())
            if not m:
                continue
            cells = [c.strip() for c in m.group(2).split("|")]
            if len(cells) != len(SFS):
                continue
            per = {}
            for sf, cell in zip(SFS, cells):
                cm = re.match(r"([\d.]+) / ([\d,]+)", cell)
                if cm:
                    per[sf] = (float(cm.group(1)), int(cm.group(2).replace(",", "")))
            out[m.group(1)] = per
    return out


def main() -> None:
    only = set(sys.argv[1:])  # empty -> full run
    spark = get_spark("scaling-probe")
    rows = _parse_prev_rows() if only else {}
    for q in PROBES:
        if not only or q in only:
            rows[q] = {}
    for sf in SFS:
        sf_dir = SF_DIRS[sf]
        if not os.path.isdir(sf_dir):
            continue
        for q in PROBES:
            if only and q not in only:
                continue
            if sf == "1" and q not in SF1_PROBES:
                continue
            spec = registry.get(q)
            spec.build(spark, sf_dir).count()  # warm (codegen + listing)
            best, n = float("inf"), 0
            for _ in range(2):
                t0 = time.time()
                n = spec.build(spark, sf_dir).count()
                best = min(best, time.time() - t0)
            rows[q][sf] = (best, n)

    lines = [
        "# SCALING — measured operator scaling across the available SFs",
        "",
        "Generated by tools/scaling_probe.py (min-of-2 after warmup, local[32]).",
        "Note the documents/embeddings tables are identical at sf0.001 and",
        "sf0.01; only sf0.1 is a 10x corpus — so the meaningful comparison is",
        "sf0.01 -> sf0.1. `rows` is the operator's OUTPUT cardinality. Wall",
        "time should grow ~linearly with input for the banded/capped joins.",
        "Output of the near-dup operators tracks the corpus's TRUE duplicate",
        "density (the synthetic corpus is duplicate-heavy by design, so e.g.",
        "q44's oracle-verified pair count grows superlinearly); what banding",
        "bounds is the CANDIDATE volume, i.e. the wall-time curve.",
        "",
        "| query | " + " | ".join(f"sf{sf} sec / rows" for sf in SFS) + " |",
        "|---|" + "---|" * len(SFS),
    ]
    for q in PROBES:
        cells = []
        for sf in SFS:
            if sf in rows.get(q, {}):
                s, n = rows[q][sf]
                cells.append(f"{s:.2f} / {n:,}")
            else:
                cells.append("—")
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    # preserve hand-written analysis sections (anything from the first "## "
    # heading onward) across regenerations of the measured table
    kept = ""
    if os.path.exists(out):
        with open(out) as f:
            prev = f.read()
        idx = prev.find("\n## ")
        if idx != -1:
            kept = prev[idx:]
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + kept)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
