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
# Round-11 gate (honoring the r10 pre-commitment): (a) the 14 r10
# registrations — never driver-gated — in registration order (all were
# locally driver-mimic green at sf0.01 AND sf0.1 in r10); (b) any NEW
# r11 registrations (never-gated ⇒ infinitely stale); (c) the 33
# remaining r6-last-green names, alphabetical; (d) r7 greens,
# alphabetical, to the 50 cut.  There were no r10 reds to re-prove
# (CORRECTNESS_r10: 50/50 green).
#
# r12 PRE-COMMITMENT: never-green names lead (any r11 registrations
# that miss this round's 50 cut plus any r11 reds being re-proven);
# then the stalest greens — the r7-last-green set (ann_* onward,
# alphabetical), then r8 — re-enumerated from CORRECTNESS history,
# oldest-green first, alphabetical within a round, to fill 50.
GATE_PRIORITY = [
    # (a) the 14 r10 registrations — first hard rows
    "theta_users_diff", "stream_theta_users_diff",
    "quality_score_auc", "quality_auc_by_source",
    "quality_calibration_bins", "stream_quality_score_auc",
    "forecast_revenue_change", "priority_late_ship_counts",
    "local_supplier_volume", "product_profit_by_nation_year",
    "late_ship_priority_counts", "supplier_count_by_part_attrs",
    "small_qty_order_revenue", "excess_part_suppliers",
    # (b) r11 registrations — never-gated, first hard rows
    "ordered_delivery_replay",
    # (c) stalest greens (last green r6), alphabetical
    "dedup_incremental_indexed", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash",
    "disjunctive_filter_revenue", "event_gaps", "fan_in_sum",
    "filter_greater", "funnel_counts", "moving_range_sum",
    "multimodal_content_stats", "pandas_udf_normalize",
    "pivot_status_counts", "pricing_summary", "rank_topn_per_segment",
    "regional_revenue", "revenue_by_dow", "rollup_revenue",
    "running_totals", "session_window_count", "set_intersect_users",
    "small_qty_revenue", "sole_return_suppliers", "star_join_agg",
    "stream_dedup_exact", "stream_window_join_inner",
    "stream_window_sum_tumbling", "window_count_dense_errors",
    "window_count_sliding", "window_join_inner", "window_lineage",
    "window_sum_per_user", "window_sum_tumbling",
    # (d) r7 greens, alphabetical, to the 50 cut
    "ann_cosine_topk", "ann_ivf_quantized_topk",
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
