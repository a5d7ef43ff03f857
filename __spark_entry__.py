"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -- flagship: full extraction pipeline over the sf0.001
                  documents table (interleaved deterministically), exploded
                  to flat span rows.
queries()      -- one entry per implemented operator (SURVEY.md §2 +
                  training-data ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()   -- DuckDB-runnable ANSI SQL per query. Non-SQL-expressible
                  queries (extraction pipeline, minhash/simhash, ANN) use
                  inline VALUES oracles recomputed sequentially on the
                  driver (kernels / hashlib / numpy; see seq_oracles.py),
                  so the driver's hash compare is a genuine distributed-
                  vs-sequential equality gate for every query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from local_pdftodocx_ocr_spark.operators import (  # noqa: E402
    dedup,
    extraction,
    multimodal,
    relational,
    similarity,
    textstats,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return extraction.extract_from_documents(spark, "/root/testdata/sf0.001")


# Iteration order matters: the driver verifies queries() in order with
# a bounded window (~50 per round). _PRIORITY rotates each round
# (VERDICT r3 #2); never-driver-checked queries ALWAYS outrank
# re-verification of green ones (ADVICE r4 #1). Round 5 pins, in
# order: (a) the 18 queries with no driver-grade row yet — the 16 new
# round-5 queries plus the two r4b stragglers (VERDICT r4 #2), (b)
# every query whose PLAN changed this round (exact-distributed NTILE
# rewrite; unified-components memo + cheaper star-CC convergence probe
# feeding the trio), then (c) the queries whose last green row is r03
# — the ~28 that fit the window this round; the tail rotates to round
# 6 (at 118 queries / ~50 per round the full rotation period is ~2.4
# rounds). The r4-green remainder fills in module order past the
# window.
_MODULE_ORDER = (dedup, similarity, multimodal, textstats, extraction, relational)

_PRIORITY = (
    # --- never driver-checked: NEW round-5 queries first ---
    "events_type_transitions", "events_props_json",
    "docs_source_vocab_overlap",
    "docs_perplexity_buckets", "docs_weighted_sample",
    "emb_kmeans", "emb_semdedup", "docs_heavy_hitters",
    "docs_decontaminate_containment", "events_value_zscore",
    "docs_span_removal", "docs_dsir_weights", "docs_bigram_loglik",
    "docs_classifier_score", "revenue_cube", "events_running_user_value",
    # --- never driver-checked (r4b landed past the window) ---
    "events_value_quantile_sketch", "docs_token_entropy",
    # --- plan changed this round ---
    "customer_balance_ntiles",
    "docs_dedup_components_unified", "docs_dedup_canonical_keep",
    "docs_dedup_cluster_sizes",
    # --- last green r03 (50 queries; the tail past the ~50-query
    # window rotates to round 6). emb_near_dup_pairs (last green r01)
    # is no longer registered: emb_near_dup_pairs_at_scale replaced it
    # and pytest pins their set equality every run ---
    "extract_spans_golden", "extract_clean_text", "extract_txt_render",
    "extract_boilerplate_html", "extract_segments_to_lines",
    "extract_complementary_merge", "extract_marker_recovery",
    "extract_table_grid", "extract_page_segmentation",
    "extract_recognize_media", "extract_external_detections",
    "extract_lineage_totals", "pipeline_training_corpus",
    "docs_dedup_exact", "docs_dedup_incremental", "docs_dedup_keep_list",
    "docs_dedup_jaccard_pairs", "docs_dedup_minhash_candidates",
    "docs_dedup_simhash_candidates", "docs_simhash64",
    "docs_dedup_components", "docs_dedup_components_at_scale",
    "docs_dedup_pipeline_at_scale",
    "emb_cosine_topk", "emb_ann_lsh_topk", "emb_ann_ivf_topk",
    "emb_knn_label_vote", "emb_near_dup_pairs_at_scale",
    "multimodal_features", "multimodal_frame_samples", "multimodal_resize",
    "docs_token_count", "docs_lang_id", "docs_quality_score",
    "docs_quality_repetition", "docs_quality_filter_chain",
    "docs_fingerprint", "docs_tfidf_top_terms", "docs_boilerplate_ngrams",
    "docs_train_test_split", "docs_benchmark_contamination",
    "docs_stratified_sample", "docs_token_budget_mix",
    "docs_chunk_for_training", "docs_term_freq_cms",
    "events_kmv_distinct", "events_error_rate_hours",
    "orders_in_promo_windows", "q8_market_share", "q15_top_supplier",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULE_ORDER:
        merged.update(mod.QUERIES)
    missing = [k for k in _PRIORITY if k not in merged]
    # fail loud: a typo or rename here would silently push a
    # never-verified query outside the driver's check window
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    out = {k: merged[k] for k in _PRIORITY}
    out.update(merged)  # dict.update never reorders existing keys
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULE_ORDER:
        fn = getattr(mod, "oracles", None)
        out.update(fn() if fn is not None else mod.ORACLES)
    return out
