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
# a bounded window (r2 checked the first 50 of 73). _PRIORITY pins the
# queries that most need a driver-grade hash check — everything never
# driver-verified (the r2 unchecked tail) plus every round-3 addition
# and the one r2 red row — to the FRONT of the registry, robust to
# future insertions shifting module offsets. The remaining slots fill
# in module order (dedup/similarity/multimodal/textstats before the
# r01/r02-triple-green extraction and relational sets).
_MODULE_ORDER = (dedup, similarity, multimodal, textstats, extraction, relational)

_PRIORITY = (
    # r2-unchecked + r3-new dedup/similarity/multimodal/textstats
    "docs_dedup_exact", "docs_dedup_incremental",
    "docs_dedup_pipeline_at_scale", "docs_dedup_components_at_scale",
    "docs_dedup_keep_list", "docs_dedup_jaccard_pairs",
    "docs_dedup_minhash_candidates", "docs_dedup_simhash_candidates",
    "docs_dedup_components", "docs_simhash64",
    "emb_near_dup_pairs_at_scale", "emb_cosine_topk", "emb_ann_ivf_topk",
    "emb_ann_lsh_topk", "emb_knn_label_vote",
    "multimodal_features", "multimodal_frame_samples", "multimodal_resize",
    "docs_chunk_for_training", "docs_term_freq_cms",
    "docs_quality_repetition", "docs_boilerplate_ngrams",
    "docs_token_budget_mix", "docs_token_count", "docs_tfidf_top_terms",
    "docs_train_test_split", "docs_benchmark_contamination",
    "docs_stratified_sample", "docs_quality_filter_chain", "docs_lang_id",
    "docs_quality_score", "docs_fingerprint",
    # r3-new extraction/relational + the r2 red row
    "extract_external_detections",
    "events_error_rate_hours", "events_kmv_distinct",
    "orders_in_promo_windows", "q8_market_share", "q15_top_supplier",
    # flagship composition + golden span equality
    "pipeline_training_corpus", "extract_spans_golden",
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
