"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in :mod:`go_streaming_spark.queries`; this module is the
thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_streaming_spark.queries import ORACLES, QUERIES  # noqa: E402
import go_streaming_spark.queries_llm  # noqa: E402,F401  (registers into QUERIES/ORACLES)
import go_streaming_spark.queries_ext  # noqa: E402,F401  (round-2 extensions)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-schema revenue rollup
    (scan → broadcast join → decimal-exact aggregation)."""
    return QUERIES["star_join_agg"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate runs the FIRST 50 queries in registration
# order.  Round-7 rotation (honoring the r6 pre-commitment): (a) the 9
# queries whose last driver-green row is r4 — two rounds unwatched — lead;
# (b) the 16 r6 registrations that have never faced the driver earn their
# first hard rows; (c) the queries added THIS round (corpus_ingest_survivors,
# multimodal_avi_content_stats, ann_ivf_quantized_topk) follow; (d) 22 of
# the 50 r5-green rows fill the remaining slots, picked by touched-code
# risk: json_struct_extract (oracle TRY_CAST fix), stat_aggregates (moment
# template refactor), dedup_incremental_minhash (cache registry), the
# similarity family (new composition in the same module), the multimodal
# family (AVI decode in the same module), and the text/dedup rows closest
# to this round's edits.  The 28 deferred r5 greens (anti_join_no_urgent_
# customers, chunk_documents, convert_long, cube_revenue,
# decontaminate_counts, distinct_users_per_type, doc_repetition_scores,
# filter_contains/_even/_odd/_smaller, flatmap_chars,
# grouping_sets_revenue, hash_split_counts, limit_first, map_affine,
# mixture_sample_counts, observe_passthrough, part_type_stats, redact_pii,
# select_from_map, semi_join_urgent_customers, stratified_sample_counts,
# stream_counting_window_sum, stream_static_enrich, tokenize_wordcount,
# topk_orders, value_percentiles) are exactly two rounds old at end of r7
# and MUST lead the r8 rotation together with the 18 queries registered
# in r7 AFTER this gate froze, which have local sf0.01+sf0.1 verification
# but no driver row yet (dedup_incremental_bloom, dedup_prefix_jaccard,
# hll_user_cardinality, bloom_join_urgent_revenue,
# multimodal_bmp_thumbnail_stats, multimodal_wav_downsample_stats,
# dedup_spans_removed_counts, stream_window_join_left, stream_fan_in_sum,
# cohort_retention_counts, mad_by_type, table_fingerprint,
# incremental_cube_update, salted_agg_status_totals,
# salted_join_type_revenue, nation_pair_volume, returned_item_customers,
# promo_revenue_pct, top_supplier_revenue — 19 with the last one; count
# them from the registry, do not trust this comment's arithmetic) — that
# is 28 + 19 = 47 of the 50 r8 slots; fill the rest from the r6 greens
# nearest staleness.
GATE_PRIORITY = [
    # (a) last green in r4 — the mandatory staleness fix
    "counting_window_sliding", "counting_window_skip",
    "counting_window_per_type", "window_join_left", "window_join_sliding",
    "fan_in_per_source", "stream_window_sum_per_user", "window_sampling",
    "set_except_user_days",
    # (b) registered in r6 after the gate froze — first hard rows
    "dedup_substring_spans", "dedup_spans_incremental",
    "dedup_spans_keep_first", "vocab_top_bigrams", "weighted_sample_ids",
    "ann_quantized_topk", "temperature_mixture_counts", "contamination_rates",
    "gopher_quality_flags", "cms_word_counts", "heavy_hitter_words",
    "stratified_fixed_counts", "join_key_skew_stats",
    "multimodal_png_content_stats", "multimodal_gif_content_stats",
    "multimodal_jpeg_content_stats",
    # (c) added this round — new work must earn hard rows
    "corpus_ingest_survivors",       # NEW: unified CorpusState.ingest e2e
    "multimodal_avi_content_stats",  # NEW: real AVI frame-pixel decode
    "ann_ivf_quantized_topk",        # NEW: IVF cell pruning × int8 scoring
    # (d) r5-green rows nearest this round's edits
    "json_struct_extract", "stat_aggregates", "dedup_incremental_minhash",
    "dedup_normalized_exact", "ann_cosine_topk", "ann_ivf_topk",
    "ann_lsh_topk", "dedup_embedding_cosine", "dedup_embedding_cosine_blocked",
    "multimodal_binary_meta", "multimodal_features", "multimodal_frame_plan",
    "multimodal_transform_chain", "tfidf_top_terms", "timeseries_znorm_search",
    "text_quality", "text_lang_id", "text_token_counts", "text_fingerprint",
    "pack_sequences", "pipeline_clean_corpus", "knn_label_vote",
]


def _ordered(d: dict) -> dict:
    missing = [n for n in GATE_PRIORITY if n not in QUERIES]
    assert not missing, f"GATE_PRIORITY names not registered: {missing}"
    return {
        **{n: d[n] for n in GATE_PRIORITY if n in d},
        **{n: v for n, v in d.items() if n not in GATE_PRIORITY},
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return _ordered(ORACLES)
