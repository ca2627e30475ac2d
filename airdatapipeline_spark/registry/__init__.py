"""Query registry: every implemented operator as a (spark_fn, oracle_sql) pair.

Keys follow SURVEY.md §2's operator IDs. Spark callables take
(spark, sf_dir) and return a DataFrame; oracle SQL is DuckDB dialect over the
driver's pre-registered parquet views, with the derived headline model
prefixed as CTEs (see model.py). Column names and value arithmetic are
mirrored exactly so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from .core import ORACLES, QUERIES, SparkQuery, register  # noqa: F401

# Importing a family module runs its @register decorators; order here
# only sets pre-reorder registration order (the driver-facing order is
# rebuilt by _reorder_registrations below).
from . import _shared  # noqa: F401,E402  (shared fragments first)
from . import relational  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import simsearch  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import sources_sinks  # noqa: F401,E402



# ---------------------------------------------------------------------------
# Registration-order policy (round-2 VERDICT item 1, round-3 rotation)
#
# The driver oracle-checks the FIRST ~50 registrations only (CORRECTNESS_r01
# and r02 each had exactly 50 rows, cut in registration order). Decorator
# order above is file-layout order, so the dicts are rebuilt here into an
# explicit priority:
#
#   1. _DRIVER_WINDOW (50 names): round-5 rotation (VERDICT-r4 item 4).
#      After r4 every registered query holds >= 1 driver row, so the window
#      now serves freshness + re-proof:
#        - the two r4 hash-reds (snk_compaction_roundtrip,
#          text_shard_manifest) stay in to re-prove green after the oracle
#          CAST(... AS BIGINT) fixes (DuckDB HUGEINT->float64 was the sole
#          cause; Spark values verified correct by the judge and locally);
#        - the §2 family canaries (flagship_enrichment_gold = §2.9 + SNK2 +
#          P1/A chain, a2_w1_daily_category_gold = A + W,
#          src1_scrape_clean = SRC, u1_union_dedup = U/D);
#        - the four heavy-plan picks whose only driver rows are r3-or-older
#          (u1_union_dedup, simsearch_ivf_topk, training_data_build, and
#          curation_pipeline — whose last driver green is r02, PREDATING its
#          r3 code move; ADVICE-r4);
#        - new r5 registrations;
#        - remaining slots: the oldest-green r1/r2 §2 queries, reducing
#          max-staleness.
#   2. Queries still never driver-checked (extra driver capacity lands on
#      new signal).
#   3. Queries already driver-green in r01/r02 (all still value-hash-checked
#      every round by tests/test_oracle_parity.py).
#
# Future rounds: register new queries anywhere above, then slot them into
# _DRIVER_WINDOW (or leave them in tier 2) — and keep this list at exactly
# 50 names.
# ---------------------------------------------------------------------------

# r12 rotation (VERDICT-r11 item 3 + changed-code re-proofs). After a
# green r11 window the staleness profile is r7: 13, r8: 45, r9: 47,
# r10: 43, r11: 50 (tools/staleness.py). Composition:
#   - 3 family canaries (pinned by the window-integrity test);
#   - slots 4-16: ALL 13 r7-stale rows (VERDICT-r11 item 3 — the dedup
#     candidate/cluster family + simsearch_ivf_list_stats/ivfpq_topk/
#     pq_adc_topk), after which max staleness drops to r8;
#   - slots 17-25: queries whose CODE or ORACLE changed in r12 and need
#     re-proof regardless of freshness: the striping-independent drift
#     flag (text_snapshot_drift_by_source — flag AND oracle changed),
#     the total-coverage SQ8 audit (emb_quantize_sq8 — CTE changed),
#     the with_norm total= refactor's serving representatives
#     (simsearch_bruteforce_topk, simsearch_bq_topk — also the r11
#     watch flag, closed as dispersion in MEASURED.md —
#     dedup_embedding_cosine_pairs), the SCD2 is_current gate
#     (scd2_customer_dim), the apply_changes redelivery-dedup +
#     conflicting-tie guard (snk_cdc_apply_changes), and the multimodal
#     _over-seam refactor (mm_decode_features, mm_audio_features);
#   - slots 26-28: the NEW r12 registrations (the versioned-table layer:
#     vt_time_travel_chain, vt_change_feed_versions, stream_vt_ingest —
#     never driver-checked, highest priority per the ladder);
#   - the remaining 22 slots: the oldest r8-stale rows (pipelines,
#     events family, snk/sources, sql-api, heavy dedup/simsearch picks).
# Left at r8 for r13 (23): the text shard/quality/mix family +
# table_profile_documents/text_bm25_topk/stream_join_append (displaced
# by the new registrations), tpch q2/q10/q11/q20, training_data_build,
# u1_union_dedup and the w_* window family; all value-hash-checked
# every pytest run.
# Max driver-row staleness after a green r12 window: r8.
_DRIVER_WINDOW = [
    # --- §2 family flagships (regression canaries) -------------------------
    "flagship_enrichment_gold",
    "a2_w1_daily_category_gold",
    "src1_scrape_clean",
    # --- all 13 r7-stale rows (VERDICT-r11 item 3) -------------------------
    "dedup_candidate_triangles",
    "dedup_cluster_assignments_star",
    "dedup_exact_substring_pairs",
    "dedup_fingerprint_quality_decisions",
    "dedup_incremental_candidates",
    "dedup_paragraph_rebuild",
    "dedup_prefix_jaccard_pairs",
    "dedup_semantic_decisions",
    "dedup_simhash_pairs",
    "dedup_substring_clusters",
    "simsearch_ivf_list_stats",
    "simsearch_ivfpq_topk",
    "simsearch_pq_adc_topk",
    # --- r12 changed-code re-proofs ----------------------------------------
    "text_snapshot_drift_by_source",
    "emb_quantize_sq8",
    "simsearch_bruteforce_topk",
    "simsearch_bq_topk",
    "dedup_embedding_cosine_pairs",
    "scd2_customer_dim",
    "snk_cdc_apply_changes",
    "mm_decode_features",
    "mm_audio_features",
    # --- new r12 registrations (versioned-table layer) ---------------------
    "vt_time_travel_chain",
    "vt_change_feed_versions",
    "stream_vt_ingest",
    # --- oldest r8-stale rotations (22 of the 45) --------------------------
    "agg_approx_family_check",
    "curation_pipeline",
    "dedup_cluster_assignments",
    "dedup_minhash_lsh_candidates",
    "dedup_simhash_lsh_candidates",
    "ev_asof_last_purchase",
    "events_cohort_retention",
    "events_daily_anomalies",
    "events_funnel",
    "events_multires_rollup",
    "events_stratified_sample",
    "events_user_features",
    "q_validation_gates",
    "simsearch_ivf_topk",
    "simsearch_recall_clustered",
    "snk_compaction_roundtrip",
    "snk_incremental_gold",
    "snk_silver_partitioned_prune",
    "sql_api_daily_sentiment",
    "sql_api_error_cascades",
    "src1_datasource_scrape",
    "src_format_roundtrip",
]

# All previously driver-proven names (newest green driver row in some
# CORRECTNESS_r0N.json; still value-hash-checked every round by
# tests/test_oracle_parity.py) — these yield the window to never-checked
# queries. Grouped below by the round whose rotation moved them out.
_PRIOR_GREEN = {
    # r10 greens (the whole r10 window was green 50/50; names below are
    # the six r10-window members without an earlier _PRIOR_GREEN row —
    # the late-r9 and r10 registrations proven in r10)
    "agg_quantile_histogram_sketch", "dedup_fuzzy_decontamination",
    "stream_quantile_ingest_append", "text_snapshot_drift",
    "stream_drift_gate_ingest", "stream_kmv_register_ingest",
    # r09 greens (the whole r9 window was green 50/50; names below are the
    # 15 queries registered and proven in r9, rotated out for r10)
    "simsearch_clustered_tier_recall", "simsearch_clustered_residual_ivfpq",
    "simsearch_clustered_rpq_rerank", "text_lm_perplexity_filter",
    "stream_lm_gated_ingest", "text_hll_shingle_cardinality",
    "text_kmv_source_overlap", "simsearch_rp_recall",
    "snk_zorder_layout_stats", "stream_hll_register_ingest",
    "emb_cluster_labels", "text_bpe_train_merges", "text_bpe_vocab_top",
    "text_vocab_oov_rate", "emb_kmeans_sq8_stats",
    "text_bpe_compression_by_source", "stream_kmeans_assign_ingest",
    # r08 greens (the whole r8 window was green 50/50; names below are the
    # r8-window members without an earlier _PRIOR_GREEN row — the six
    # queries registered and proven in r8, rotated out for r9)
    "text_shard_vacuum_readmit", "simsearch_bq_topk", "text_bm25_topk",
    "text_heavy_hitters", "src_format_roundtrip", "events_stratified_sample",
    # r07 greens (the whole r7 window was green 50/50; the name below is
    # the only r7-window member without an earlier _PRIOR_GREEN row —
    # the tombstone seam query registered and proven in r7)
    "text_shard_delete_tombstone",
    # r06 greens (the whole r6 window was green 50/50; names below are the
    # r6-window members without an earlier _PRIOR_GREEN row, rotated out
    # for r7 — the shard lifecycle family registered and proven in r6)
    "text_shard_append_conservation", "stream_shard_ingest",
    "text_shard_compact_conservation", "text_shard_delete_conservation",
    "text_shard_verify_report", "text_epoch_schedule",
    "text_epoch_token_slice", "text_curated_append",
    # r05 greens (the whole r5 window was green 50/50; names below are the
    # r5-window members without an earlier _PRIOR_GREEN row, rotated out
    # for r6)
    "snk_compaction_roundtrip", "text_shard_manifest",
    "text_shard_write_conservation", "simsearch_recall_clustered",
    "text_decontamination_bloom",
    # r04 greens (rotated out of the window for r5; every name below has a
    # green CORRECTNESS_r04 row — the only two r4 reds are back IN the
    # window to re-prove after their oracle CAST fixes)
    "text_temperature_mix_weights", "text_token_rarity_scores",
    "stream_curated_ingest", "tpch_q2_min_cost_supplier",
    "tpch_q10_returned_items", "tpch_q11_important_stock",
    "tpch_q20_excess_shipments", "w_user_gap_median",
    "w_daily_revenue_deltas", "w_trailing_week_revenue",
    "w_customer_rfm_segments", "events_funnel", "events_cohort_retention",
    "events_daily_anomalies", "events_user_features",
    "events_multires_rollup", "sql_api_daily_sentiment",
    "sql_api_error_cascades", "agg_approx_family_check",
    "src1_datasource_scrape", "stream_join_append",
    "table_profile_documents", "mm_binary_features", "mm_resize_roundtrip",
    "mm_frame_sample", "mm_audio_features", "dedup_simhash_pairs",
    "dedup_embedding_cosine_pairs", "dedup_incremental_candidates",
    "dedup_cluster_assignments_star", "dedup_substring_clusters",
    "dedup_exact_substring_pairs", "dedup_semantic_decisions",
    "dedup_fingerprint_quality_decisions", "dedup_candidate_triangles",
    "dedup_paragraph_rebuild", "simsearch_bruteforce_topk",
    "simsearch_sq8_topk", "simsearch_pq_adc_topk", "simsearch_ivfpq_topk",
    "simsearch_ivf_list_stats", "emb_quantize_sq8", "text_pack_greedy",
    "text_source_quality_report", "text_quality_model_scores",
    # r03 greens now back IN the r5 window (harmless here — window names
    # are excluded from the tier split). NOTE (ADVICE-r4): curation_pipeline
    # was wrongly listed as r03-green; its last driver green is r02,
    # predating its r3 code move — hence its slot in the r5 window.
    "u1_union_dedup", "simsearch_ivf_topk", "training_data_build",
    "curation_pipeline",
    # r03 greens
    "tpch_q4_order_priority_exists", "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume", "tpch_q8_market_share",
    "tpch_q9_profit_by_nation_year", "tpch_q10_returned_revenue",
    "tpch_q12_priority_shipping", "tpch_q13_custdist",
    "tpch_q14_promo_revenue_pct", "tpch_q15_top_supplier",
    "tpch_q16_supplier_count", "tpch_q17_small_quantity",
    "tpch_q18_large_volume", "tpch_q19_bracketed_revenue",
    "tpch_q21_sole_returned_supplier", "tpch_q22_idle_customers",
    "snk_merge_upsert_delete", "snk_cdc_apply_changes", "scd2_customer_dim",
    "snk_targeted_delete", "snk_snapshot_diff", "text_sequence_packing",
    "text_pii_redaction", "text_decontamination", "text_train_val_split",
    "text_training_mix_sample", "text_repetition_filters", "text_chunking",
    "text_postings_phrase_search", "text_length_quantiles_by_lang",
    "text_adaptive_source_filter", "stream_sliding_append",
    "stream_join_outer_append", "stream_dedup_append",
    "stream_stateful_user_counts", "j_salted_hotkey_events",
    "agg_grouping_sets_orders", "agg_cube_orders", "agg_quantiles_quantity",
    "j_bloom_pruned_urgent_revenue", "events_transition_matrix",
    "simsearch_recall", "dedup_prefix_jaccard_pairs",
    # r01 ∪ r02 greens
    "p1_staging_projection", "p2_p3_clean_links", "p5_p6_today_ok_rows",
    "p7_date_range_filter", "p8_nulldrop_metric", "p9_top5_membership_filter",
    "p10_validate_domains", "d1_d2_dedup_headlines", "d4_distinct_dates",
    "j1_pending_antijoin", "j2_j3_pending_metrics", "a1_daily_sentiment_gold",
    "a3_sentiment_today", "a4_top_categories_today", "a5_a6_a7_today_scalars",
    "a8_confidence_by_date_sentiment", "a9_sentiment_distribution_pct",
    "a10_period_kpis", "a11_category_totals", "a12_pivot_date_category",
    "a13_unpivot_sentiment_long", "a14_collect_confidences",
    "a15_histogram_bins", "a16_a19_summary_stats", "t1_t2_gold_ordered",
    "t3_recent_headlines_topk", "t4_t5_batch_limit",
    "q_scalar_display_functions", "q_validation_gates", "src_csv_roundtrip",
    "snk_silver_partitioned_prune", "dedup_minhash_lsh_candidates",
    "dedup_simhash_lsh_candidates", "snk_incremental_gold",
    "dedup_cluster_assignments", "q_expectations_report", "simsearch_lsh_topk",
    "ev_asof_last_purchase", "ev_range_errors_near_clicks",
    "bucketed_order_revenue", "curation_pipeline", "stream_tumbling_append",
    "stream_session_append", "mm_decode_features",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_regional_revenue", "agg_rollup_lineitem",
    "agg_distinct_customers_per_segment", "w_topk_customers_per_nation",
    "w_running_daily_revenue", "events_daily_by_type", "events_json_extract",
    "events_sessionization", "text_token_stats_by_source",
    "text_quality_scores", "text_langid_confusion",
    "text_fingerprint_clusters", "dedup_exact_groups",
    "dedup_ngram_jaccard_pairs",
}


def _reorder_registrations() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"_DRIVER_WINDOW references unregistered queries: {missing}"
    assert len(_DRIVER_WINDOW) == len(set(_DRIVER_WINDOW)) == 50, "driver window must be 50 names"
    rest = [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    order = (
        list(_DRIVER_WINDOW)
        + [n for n in rest if n not in _PRIOR_GREEN]
        + [n for n in rest if n in _PRIOR_GREEN]
    )
    queries = {n: QUERIES[n] for n in order}
    oracles = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(queries)
    ORACLES.clear()
    ORACLES.update(oracles)


_reorder_registrations()
