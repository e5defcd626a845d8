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
# order.  STANDING ROTATION POLICY (r8 onward): each round's gate is the
# 50 registered queries with the OLDEST last-driver-green row, in LRU
# order — queries with NO green driver row yet (new registrations and
# red rows being re-proven) count as infinitely stale and always lead;
# ties break toward code touched in the current round.  With ~150
# registered queries every query earns a hard row at least every 3
# rounds.
#
# Round-10 gate (honoring the r9 pre-commitment): (a) the two r9 red
# rows lead — bpe_top_merges / bpe_encode_counts were gated in r9
# WITHOUT oracles (err: no_oracle); r10 gives both real DuckDB oracles
# (the double-separator replace encoding of greedy merge-with-skip —
# see queries_llm._bpe_learn_oracle) so they must now re-prove green;
# (b) the 26 carried never-green names in registration order, with
# compression_ratio_stats re-scoped this round to the zlib
# bounds-invariant output so it too carries an oracle; (c) the 8 r9
# registrations in registration order; (d) 14 stalest greens — the
# r6-green set, alphabetical — to fill 50.
#
# r11 PRE-COMMITMENT: never-green names lead, i.e. the 14 r10
# registrations in registration order (theta_users_diff,
# stream_theta_users_diff, forecast_revenue_change,
# priority_late_ship_counts, local_supplier_volume,
# product_profit_by_nation_year, late_ship_priority_counts,
# supplier_count_by_part_attrs, small_qty_order_revenue,
# excess_part_suppliers, quality_score_auc, quality_auc_by_source,
# quality_calibration_bins, stream_quality_score_auc — all locally
# driver-mimic green at sf0.01 AND sf0.1 in r10) plus any r10 reds
# being re-proven; then the remaining r6 greens that missed the r10
# cut (dedup_incremental_indexed, dedup_minhash_lsh,
# dedup_ngram_jaccard, dedup_simhash, disjunctive_filter_revenue,
# event_gaps, fan_in_sum, filter_greater, funnel_counts,
# moving_range_sum, multimodal_content_stats, pandas_udf_normalize,
# pivot_status_counts, pricing_summary, rank_topn_per_segment,
# regional_revenue, ... — re-enumerate from CORRECTNESS history,
# oldest-green first, alphabetical within a round) to fill 50.
GATE_PRIORITY = [
    # (a) the r9 red rows — oracles added in r10, must re-prove green
    "bpe_top_merges", "bpe_encode_counts",
    # (b) the 26 carried never-green names (pre-committed order)
    "token_drift_by_source", "value_drift_by_type",
    "cheapest_supplier_per_part", "stream_distinct_users_hourly",
    "mad_outlier_counts", "weighted_value_percentiles",
    "weighted_price_percentiles_by_priority", "value_cdf_quantized",
    "hourly_burst_flags", "cms_join_size", "dedup_keep_best_survivors",
    "profile_orders_columns", "review_queue_sample",
    "missing_days_report", "tokenizer_fertility_by_lang",
    "compression_ratio_stats", "mixed_language_flags",
    "partition_manifest_orders", "source_health_report",
    "dedup_source_matrix", "embedding_dim_stats", "user_lifespan_report",
    "session_conversion_counts", "top_user_journeys", "activity_heatmap",
    "stream_activity_heatmap",
    # (c) the r9 registrations — first hard rows
    "dedup_components_star", "hll_user_overlap",
    "stream_hll_user_overlap", "winnow_match_pairs",
    "token_budget_sample_counts", "word_graph_triangles",
    "stratified_token_budget_counts", "ams_f2_user_freq",
    # (d) stalest greens (last green r6), alphabetical, to the 50 cut
    "above_avg_balance_by_nation", "approx_distinct_users",
    "approx_value_percentiles", "asof_forward_next_purchase",
    "asof_join_signup", "big_order_customers", "burst_follow_counts",
    "corpus_shuffle_order", "counting_window_tumbling",
    "custdist_order_counts", "dedup_clusters", "dedup_exact",
    "dedup_incremental_exact", "dedup_incremental_full",
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
