"""Driver-catalog rotation: cycle overflow twins through the
driver's independent CORRECTNESS gate.

The driver checks at most ~50 catalog entries per round; the engine
has 128 oracle-checked queries. Twins are verified by the repo's own
pytest harness (tests/test_twin_queries.py) with the same row-count +
schema + value-hash comparison — but a self-hosted oracle bug would
be self-confirming, so each round re-slots the catalog: ~15 ANCHORS
(one per operator family, stable across rounds so every round's
CORRECTNESS json stays comparable on them) plus ~35 slots filled
with queries the driver has never checked, rotating until every twin
has at least one green driver row. ROTATION.md is the ledger.

Demoted queries keep full oracle coverage — they move to
TWIN_QUERIES and the twin pytest picks them up automatically (both
sides share the registry contract).
"""

from __future__ import annotations

from bigdata_commerce_spark.plans.registry import (
    ORACLES,
    QUERIES,
    TWIN_ORACLES,
    TWIN_QUERIES,
)

# One per family; stable across rounds. Flagship region_top3_parts
# stays (it is __spark_entry__.entry()).
ANCHORS: tuple[str, ...] = (
    "pricing_summary",        # scan + agg + pushdown
    "region_top3_parts",      # dims broadcast join + windowed top-k
    "session_stats",          # commerce sessionization
    "ad_cumulative_stats",    # streaming family (batch twin)
    "dedup_minhash_lsh",      # shingle/LSH dedup
    "dedup_clusters",         # connected components
    "embedding_cosine_topk",  # exact similarity
    "embedding_ann_ivf",      # ANN indexing
    "multimodal_features",    # mapInPandas kernels
    "text_quality_score",     # text analysis
    "bpe_token_counts",       # tokenizer
    "pack_sequences",         # sequence packing
    "train_test_split",       # mixing/sampling
    "corpus_curation",        # composed curation pipeline
    "heavy_hitter_users",     # sketches
)

# Round 6: the 35 promoted twins had NEVER been driver-checked
# (absent from CORRECTNESS_r01..r05); the 35 demoted driver queries
# all carry >=1 green driver row from rounds 1-5.
PROMOTE_R6: tuple[str, ...] = (
    "documents_canonical_urls",
    "url_dedup_survivors",
    "url_host_report",
    "url_blocklist_survivors",
    "doc_duplicate_spans",
    "docs_scrubbed_dupspans",
    "doc_contaminated_spans",
    "benchmark_contamination",
    "doc_phrase_tags",
    "bm25_doc_scores",
    "hybrid_search_rrf",
    "embedding_hard_negatives",
    "embeddings_jl_projected",
    "embeddings_quantized",
    "doc_char_bigram_nll",
    "doc_quality_linear_score",
    "doc_tfidf_keywords",
    "docs_weighted_sample",
    "docs_group_split",
    "source_capped_docs",
    "docs_upsampled_epochs",
    "mixture_sample",
    "rate_capped_events",
    "incremental_dedup_novel",
    "docs_bloom_anti",
    "docs_editdist_join",
    "chunk_documents",
    "documents_global_index",
    "documents_shuffled_index",
    "dedup_canonical_docs",
    "user_hourly_ohlc",
    "user_daily_value_locf",
    "orders_scd2_segment",
    "user_window_funnel",
    "cohort_retention",
)

DEMOTE_R6: tuple[str, ...] = (
    "ad_blacklist",
    "ad_click_trend",
    "ad_launch_window_counts",
    "ad_minute_counts",
    "ad_province_top3",
    "approx_distinct_users",
    "asof_click_attribution",
    "commerce_area_top3",
    "commerce_session_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprints",
    "embedding_ann_lsh",
    "embedding_neardup",
    "event_rollup_ladder",
    "events_pivot",
    "exact_price_percentiles",
    "lang_id",
    "lineitem_cube",
    "lineitem_rollup",
    "local_supplier_volume",
    "multimodal_frame_sample",
    "page_funnel",
    "pii_scrub",
    "price_quantiles",
    "repetition_stats",
    "returned_item_customers",
    "salted_user_event_counts",
    "session_extract",
    "supplier_window_suite",
    "top_categories",
    "top_orders_by_revenue",
    "top_users_per_category",
    "users_click_no_purchase",
)

# Round 7 closes the ledger: promote EVERY remaining never-driver-
# checked twin. Of the 36-query pool, three stay twins with explicit
# row-identity pins to driver-verified siblings instead of burning a
# slot (the driver catalog is full at 15 anchors + the 33 below + the
# two re-slotted flattened embedding queries):
#   - chunk_documents_udtf  == chunk_documents        (driver r6)
#   - asof_skew_bounded     == asof_click_attribution (driver r1-r5)
#   - sessionize_skew_bounded == the exact sessionize path that
#     feeds the session_stats anchor (driver r1-r6)
# (pins asserted in tests/test_twin_queries.py).
PROMOTE_R7: tuple[str, ...] = (
    "boilerplate_scrub",
    "corpus_curation_funnel",
    "corpus_report",
    "cross_corpus_links",
    "customer_rfm_segments",
    "data_quality_report",
    "docs_bloom_semi",
    "embedding_centroid_drift",
    "event_value_percentile_bands",
    "events_agg_refresh",
    "events_ewma_value",
    "events_grouping_sets",
    "events_key_skew",
    "events_profile",
    "events_running_value",
    "events_snapshot_diff",
    "events_value_winsorized",
    "events_variant_fields",
    "group_concat_distinct_udaf",
    "latest_user_events",
    "lineitem_corr_matrix",
    "lineitem_unpivot",
    "orders_customer_key_overlap",
    "parts_bought_together",
    "price_distribution_psi",
    "source_dup_matrix",
    "top_bigrams",
    "ts_similar_users",
    "user_decayed_value",
    "user_next_event_examples",
    "user_value_anomalies",
    "user_value_robust_anomalies",
    "user_value_trend",
)

# The r6 promotions demote after their green r6 rows — EXCEPT the two
# embedding queries, whose r6 rows were red (array-output driver
# crash): their now-flattened forms stay slotted to earn the green
# row in r7.
DEMOTE_R7: tuple[str, ...] = tuple(
    q
    for q in PROMOTE_R6
    if q not in ("embeddings_jl_projected", "embeddings_quantized")
)

# Round 8 opens maintenance mode (ROTATION.md "Round-8 plan"): anchors
# stay; the 35 non-anchor slots go to the six `queued (r8)` curation-
# recipe queries (never driver-checked), then the thinnest-verified
# twins oldest-driver-row-first (region_top3_parts_sql r1-only, the
# r1-r2 cohort, the r2 cohort, chunk_documents_udtf trading its pin
# for its own row), then the r1-r5 cohort alphabetically. All 35
# pre-checked at sf0.01 under driver_slot=True strictness.
PROMOTE_R8: tuple[str, ...] = (
    # queued (r8) — never driver-checked
    "gopher_quality_flags",
    "ccnet_perplexity_buckets",
    "c4_line_filter",
    "doc_top_ngram_coverage",
    "dsir_importance_weights",
    "doc_encoding_quality",
    # thinnest verification first
    "region_top3_parts_sql",      # r1 only
    "minhash_signatures",         # r1-r2
    "simhash_values",             # r1-r2
    "text_stats",                 # r1-r2
    "users_click_and_purchase",   # r1-r2
    "embedding_ann_ivf_indexed",  # r2
    "multimodal_resize",          # r2
    "chunk_documents_udtf",       # pinned only until now
    # r1-r5 cohort, alphabetical
    "ad_blacklist",
    "ad_click_trend",
    "ad_launch_window_counts",
    "ad_minute_counts",
    "ad_province_top3",
    "approx_distinct_users",
    "asof_click_attribution",
    "commerce_area_top3",
    "commerce_session_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprints",
    "embedding_ann_lsh",
    "embedding_neardup",
    "event_rollup_ladder",
    "events_pivot",
    "exact_price_percentiles",
    "lang_id",
    "lineitem_cube",
    "lineitem_rollup",
)

# Every r7 non-anchor slot demotes after its green r7 row (CORRECTNESS_r07
# was 50/50): the 33 r7 promotions plus the two re-slotted flattened
# embedding queries.
DEMOTE_R8: tuple[str, ...] = PROMOTE_R7 + (
    "embeddings_jl_projected",
    "embeddings_quantized",
)

# Round 9 (maintenance, ROTATION.md "Round-9 plan"): anchors stay; the
# 35 non-anchor slots go to the five `queued (r9)` round-8 additions
# (never driver-checked), then the 14 r5-last twins, then the r6
# cohort alphabetically through docs_upsampled_epochs. All 35
# pre-checked at sf0.01 under driver_slot=True strictness before
# commit (the standing pre-check).
PROMOTE_R9: tuple[str, ...] = (
    # queued (r9) — never driver-checked
    "doc_encoding_repair",
    "published_recipe_funnel",
    "embedding_semdedup",
    "corpus_token_economics",
    "multimodal_phash_pairs",
    # r5-last cohort (oldest driver row = r5)
    "local_supplier_volume",
    "multimodal_frame_sample",
    "page_funnel",
    "pii_scrub",
    "price_quantiles",
    "repetition_stats",
    "returned_item_customers",
    "salted_user_event_counts",
    "session_extract",
    "supplier_window_suite",
    "top_categories",
    "top_orders_by_revenue",
    "top_users_per_category",
    "users_click_no_purchase",
    # r6 cohort, alphabetical through docs_upsampled_epochs
    "benchmark_contamination",
    "bm25_doc_scores",
    "chunk_documents",
    "cohort_retention",
    "dedup_canonical_docs",
    "doc_char_bigram_nll",
    "doc_contaminated_spans",
    "doc_duplicate_spans",
    "doc_phrase_tags",
    "doc_quality_linear_score",
    "doc_tfidf_keywords",
    "docs_bloom_anti",
    "docs_editdist_join",
    "docs_group_split",
    "docs_scrubbed_dupspans",
    "docs_upsampled_epochs",
)

# Every r8 non-anchor slot demotes after its green r8 row
# (CORRECTNESS_r08 was 50/50).
DEMOTE_R9: tuple[str, ...] = PROMOTE_R8

# Round 10 (maintenance, ROTATION.md "Round-10 plan", finalized at r9
# close): anchors stay; the 35 non-anchor slots go to the two `queued
# (r10)` round-9 token-budget additions (never driver-checked), then
# the remaining r6 cohort alphabetically (17), then the r7 cohort
# alphabetically through events_profile (16). All 35 pre-checked at
# sf0.01 under driver_slot=True strictness at round-9 close (both
# queued rows also green at sf0.001); events_running_value heads the
# r11 queue.
PROMOTE_R10: tuple[str, ...] = (
    # queued (r10) — never driver-checked
    "token_budget_docs",
    "temperature_token_mix",
    # r6 cohort rest, alphabetical (oldest driver row = r6)
    "docs_weighted_sample",
    "documents_canonical_urls",
    "documents_global_index",
    "documents_shuffled_index",
    "embedding_hard_negatives",
    "hybrid_search_rrf",
    "incremental_dedup_novel",
    "mixture_sample",
    "orders_scd2_segment",
    "rate_capped_events",
    "source_capped_docs",
    "url_blocklist_survivors",
    "url_dedup_survivors",
    "url_host_report",
    "user_daily_value_locf",
    "user_hourly_ohlc",
    "user_window_funnel",
    # r7 cohort, alphabetical through events_profile
    "boilerplate_scrub",
    "corpus_curation_funnel",
    "corpus_report",
    "cross_corpus_links",
    "customer_rfm_segments",
    "data_quality_report",
    "docs_bloom_semi",
    "embedding_centroid_drift",
    "embeddings_jl_projected",
    "embeddings_quantized",
    "event_value_percentile_bands",
    "events_agg_refresh",
    "events_ewma_value",
    "events_grouping_sets",
    "events_key_skew",
    "events_profile",
)

# Every r9 non-anchor slot demotes after its green r9 row
# (CORRECTNESS_r09 was 50/50).
DEMOTE_R10: tuple[str, ...] = PROMOTE_R9

# Round 11 (maintenance, ROTATION.md "Round-11 plan", finalized at
# r10 close): anchors stay; the 35 non-anchor slots go to the three
# `queued (r11)` round-10 additions (never driver-checked), then the
# rest of the r7 cohort alphabetically (19 — these r7-only rows hit
# the 4-round ledger horizon at r11 and cannot slip), then the first
# 13 of the r8 cohort alphabetically through dedup_exact. All 35
# pre-checked at sf0.01 under driver_slot=True strictness at
# round-10 close (the three queued rows also green at sf0.001);
# dedup_ngram_jaccard heads the r12 queue.
PROMOTE_R11: tuple[str, ...] = (
    # queued (r11) — never driver-checked
    "multimodal_phash_wide",
    "multimodal_phash_wide_pairs",
    "token_budget_fill",
    # r7 cohort rest, alphabetical (oldest driver row = r7; ledger
    # horizon forces these in this round)
    "events_running_value",
    "events_snapshot_diff",
    "events_value_winsorized",
    "events_variant_fields",
    "group_concat_distinct_udaf",
    "latest_user_events",
    "lineitem_corr_matrix",
    "lineitem_unpivot",
    "orders_customer_key_overlap",
    "parts_bought_together",
    "price_distribution_psi",
    "source_dup_matrix",
    "top_bigrams",
    "ts_similar_users",
    "user_decayed_value",
    "user_next_event_examples",
    "user_value_anomalies",
    "user_value_robust_anomalies",
    "user_value_trend",
    # r8 cohort, alphabetical through dedup_exact
    "ad_blacklist",
    "ad_click_trend",
    "ad_launch_window_counts",
    "ad_minute_counts",
    "ad_province_top3",
    "approx_distinct_users",
    "asof_click_attribution",
    "c4_line_filter",
    "ccnet_perplexity_buckets",
    "chunk_documents_udtf",
    "commerce_area_top3",
    "commerce_session_stats",
    "dedup_exact",
)

# Every r10 non-anchor slot demotes after its green r10 row
# (CORRECTNESS_r10 was 50/50).
DEMOTE_R11: tuple[str, ...] = PROMOTE_R10

# Round 12 (maintenance, ROTATION.md "Round-12 plan", finalized at
# r11 close): anchors stay; no `queued (r12)` rows exist (round 11's
# new operator, media_phash_dct, is a real-decode kernel with no
# SQL-expressible oracle — pytest pins, not the registry), so the 35
# non-anchor slots go to the rest of the r8-latest cohort
# alphabetically (all 22 — these hit the 4-round ledger horizon at
# r12 and cannot slip), then the first 13 of the r9-latest cohort
# alphabetically through doc_tfidf_keywords. All 35 pre-checked at
# sf0.01 under driver_slot=True strictness at round-11 close;
# docs_bloom_anti heads the r13 queue.
PROMOTE_R12: tuple[str, ...] = (
    # r8 cohort rest, alphabetical (oldest driver row = r8; ledger
    # horizon forces these in this round)
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_encoding_quality",
    "doc_fingerprints",
    "doc_top_ngram_coverage",
    "dsir_importance_weights",
    "embedding_ann_ivf_indexed",
    "embedding_ann_lsh",
    "embedding_neardup",
    "event_rollup_ladder",
    "events_pivot",
    "exact_price_percentiles",
    "gopher_quality_flags",
    "lang_id",
    "lineitem_cube",
    "lineitem_rollup",
    "minhash_signatures",
    "multimodal_resize",
    "region_top3_parts_sql",
    "simhash_values",
    "text_stats",
    "users_click_and_purchase",
    # r9 cohort, alphabetical through doc_tfidf_keywords
    "benchmark_contamination",
    "bm25_doc_scores",
    "chunk_documents",
    "cohort_retention",
    "corpus_token_economics",
    "dedup_canonical_docs",
    "doc_char_bigram_nll",
    "doc_contaminated_spans",
    "doc_duplicate_spans",
    "doc_encoding_repair",
    "doc_phrase_tags",
    "doc_quality_linear_score",
    "doc_tfidf_keywords",
)

# Every r11 non-anchor slot demotes after its green r11 row
# (CORRECTNESS_r11 was 50/50).
DEMOTE_R12: tuple[str, ...] = PROMOTE_R11

DRIVER_SLOT_CAP = 50


def apply_rotation(
    promote: tuple[str, ...] = PROMOTE_R6, demote: tuple[str, ...] = DEMOTE_R6
) -> None:
    """Move ``demote`` driver entries to the twin registry and
    ``promote`` twins into the driver catalog. Loud on any
    inconsistency; asserts the slot cap and that anchors never move."""
    overlap = set(promote) & set(demote)
    if overlap:
        raise ValueError(f"promote/demote overlap: {sorted(overlap)}")
    moving_anchor = (set(promote) | set(demote)) & set(ANCHORS)
    if moving_anchor:
        raise ValueError(f"anchors are not rotatable: {sorted(moving_anchor)}")
    for name in demote:
        if name not in QUERIES:
            raise KeyError(f"demote {name!r}: not in the driver catalog")
        TWIN_QUERIES[name] = QUERIES.pop(name)
        if name in ORACLES:
            TWIN_ORACLES[name] = ORACLES.pop(name)
    for name in promote:
        if name not in TWIN_QUERIES:
            raise KeyError(f"promote {name!r}: not in the twin registry")
        QUERIES[name] = TWIN_QUERIES.pop(name)
        if name in TWIN_ORACLES:
            ORACLES[name] = TWIN_ORACLES.pop(name)
    if len(QUERIES) > DRIVER_SLOT_CAP:
        raise ValueError(
            f"driver catalog over its {DRIVER_SLOT_CAP}-slot cap: {len(QUERIES)}"
        )
    missing_anchor = set(ANCHORS) - set(QUERIES)
    if missing_anchor:
        raise ValueError(f"anchor missing from driver catalog: {sorted(missing_anchor)}")
