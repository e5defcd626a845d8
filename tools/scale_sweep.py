"""Scale sweep: measure how headline queries scale from sf0.01 → sf0.1 →
sf≈1 (a 10× key-offset replication of sf0.1 built in /tmp).

The replicated fact tables (lineitem, orders, events, documents,
embeddings) get per-copy key offsets so join/groupBy cardinalities scale
realistically (10× orders, not 10 duplicates of each order); dimensions
(region/nation/customer/supplier/part) stay fixed, as they would at a real
larger scale factor.  Foreign keys into dimensions are preserved verbatim.

Run: python tools/scale_sweep.py --build     # once: writes /tmp/scale_sf1
     python tools/scale_sweep.py             # measure (fresh process!)
Prints one JSON line per scale with per-query seconds — paste into
SCALE.md.  Timing is end-to-end (plan + execute + collect-to-count).

Measure in a PROCESS THAT DID NOT BUILD: the 10-way union/write leaves the
JVM with enough GC/memory pressure to inflate subsequent query times 5-15×
(measured: dedup_ngram_jaccard 229 s post-build vs 13.6 s clean).  The
sf0.01 pass doubles as the JIT warm-up for the larger scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"
COPIES = 10

# fact tables and the key columns that must stay distinct across copies
FACTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]

QUERIES = [
    "pricing_summary",        # wide scan + groupBy (Q1)
    "star_join_agg",          # fact + broadcast dims
    "window_sum_tumbling",    # event-time windows
    "session_window_count",   # session state
    "sole_return_suppliers",  # two-level agg + join-back
    "dedup_minhash_lsh",      # shingle → minhash → band join
    "dedup_ngram_jaccard",    # exact inverted-index pairs (quadratic terms)
    "dedup_simhash",          # hamming-band near-dup
    "ann_cosine_topk",        # embedding scan top-k
    "text_quality",           # map-only text features
    "big_order_customers",    # Q18: derived-small-side broadcast (round 4)
    "pack_sequences",         # bucketed cumsum packing (round 4)
    "dedup_incremental_exact",# digest anti-join vs corpus (round 4)
    "dedup_normalized_exact", # canonical-form digest dedup (round 5)
    "dedup_incremental_minhash",  # band-index batch-vs-corpus (round 5)
    "multimodal_features",    # real header decode, mapInPandas (round 5)
    "dedup_incremental_full", # + in-batch component resolution (round 6)
    "multimodal_content_stats",   # real BMP/WAV content decode (round 6)
    "dedup_substring_spans",  # span-granularity exact dedup (round 6)
    "ann_quantized_topk",     # int8-quantized cosine top-k (round 6)
    "dedup_spans_keep_first", # removable-span variant (round 6)
    "contamination_rates",    # eval-overlap measurement (round 6)
    "cms_word_counts",        # count-min sketch build+estimate (round 6)
    "heavy_hitter_words",     # CMS prefilter + exact verify (round 6)
    "multimodal_png_content_stats",  # real PNG content decode (round 6)
    "multimodal_gif_content_stats",  # real GIF LZW decode (round 6)
    "multimodal_jpeg_content_stats", # real baseline JPEG decode (round 6)
    "multimodal_avi_content_stats",  # real AVI movi-frame decode (round 7)
    "ann_ivf_quantized_topk",   # IVF x int8 composition (round 7)
    "dedup_incremental_bloom",  # Bloom-prefiltered digest anti-join (round 7)
    "hll_user_cardinality",     # mergeable HLL cardinality sketch (round 7)
    "corpus_ingest_survivors",  # unified CorpusState.ingest e2e (round 7)
    "nation_pair_volume",       # Q7: two dimension chains (round 7)
    "returned_item_customers",  # Q10: TakeOrdered top-20 (round 7)
    "promo_revenue_pct",        # Q14: quantized revenue share (round 7)
    "top_supplier_revenue",     # Q15: scalar-max semi-join (round 7)
    "multimodal_mp4_content_stats",  # real ISO-BMFF sample decode (round 8)
    "hist_value_percentiles",   # mergeable histogram quantiles (round 8)
    "ann_pq_adc_topk",          # PQ codebooks + ADC lookup scan (round 8)
    "pmi_top_bigrams",          # PMI collocations, ratio-ranked (round 8)
    "semdedup_survivors",       # cluster-then-dedup, within-cluster pairs (round 8)
    "shipping_priority_topn",   # Q3: pushed filters + TakeOrdered (round 8)
    "dormant_rich_customers",   # Q22: scalar compare + anti-join (round 8)
    "dedup_components_star",    # edge-contracting star CC (round 9)
    "hll_user_overlap",         # HLL union+intersection estimates (round 9)
    "winnow_match_pairs",       # MOSS winnowing fingerprint matching (round 9)
    "corpus_ingest_clean_tokens",  # span-reuse ingest_clean (r9 rework)
    "word_graph_triangles",        # degree-ordered triangle census (round 9)
    "stratified_token_budget_counts",  # per-stratum prefix-sum budgets (round 9)
    "ams_f2_user_freq",            # AMS F2 self-join-size sketch (round 9)
    "theta_users_diff",            # theta/KMV set algebra (round 10)
    # dedup_ngram_jaccard already above — r10 re-sweep covers the default cap
    "dedup_containment_pairs",     # r10: explode fan-out + checkpointed aggs
    "bpe_top_merges",              # r10: exact batched merge passes
    "local_supplier_volume",       # Q5 star (round 10)
    "product_profit_by_nation_year",  # Q9 rollup (round 10)
    "quality_score_auc",           # 256-bucket prefix-sum AUC (round 11)
    "quality_calibration_bins",    # rank-free reliability bins (round 11)
    "forecast_revenue_change",     # Q4 semi-join shape (round 11)
    "excess_part_suppliers",       # Q20 semi-join chain (round 11)
]


def build(spark) -> None:
    for t, keys in FACTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        offsets = {k: src.agg(F.max(k)).first()[0] + 1 for k in keys}
        parts = []
        for i in range(COPIES):
            c = src
            for k, off in offsets.items():
                c = c.withColumn(k, (F.col(k) + F.lit(i * off)).cast(src.schema[k].dataType))
            if t == "documents" and i > 0:
                # de-correlate text across copies (every word gets a
                # copy-salt prefix, so no shingle survives between copies):
                # a naive 10x replication makes EVERY doc 9 exact clones
                # and near-dup pair counts explode ~1000x — that's a dup
                #-rate change, not a scale change.  Within-copy near-dup
                # structure is preserved exactly (uniform transformation).
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(F.lit(f"c{i}"), w),
                        ),
                        " ",
                    ),
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"built {t}: {COPIES}x", flush=True)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )


DST10 = "/tmp/scale_sf10_docs"


def build10(spark) -> None:
    """Documents-only sf≈10 (500k docs): 10 more key-offset copies of the
    sf≈1 documents, with a second word-salt layer so no shingle survives
    across copies — the decade probe for the pair-generating dedups only
    (no other table is read by those queries)."""
    src = spark.read.parquet(f"{DST}/documents.parquet")
    off = src.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(COPIES):
        c = src.withColumn(
            "doc_id",
            (F.col("doc_id") + F.lit(i * off)).cast(src.schema["doc_id"].dataType),
        )
        if i > 0:
            c = c.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(F.lit(f"d{i}"), w),
                    ),
                    " ",
                ),
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{DST10}/documents.parquet")
    print(f"built documents sf≈10: {COPIES}x sf≈1", flush=True)


def pairs_decade() -> None:
    """Measure the two pair-generating dedups at sf≈1 → sf≈10 with cap
    sensitivity: does max_bucket_size / max_shingle_freq bound the bucket
    cross products as planted-dup density grows 10×?  Run in a process
    that did NOT build (see module docstring)."""
    from go_streaming_spark.functions import dedup
    from go_streaming_spark.session import get_session

    spark = get_session("scale-sweep-pairs")
    spark.sparkContext.setLogLevel("ERROR")
    for sf, sf_dir in [(1.0, DST), (10.0, DST10)]:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = {}
        for cap in (None, 200, 50):
            t0 = time.time()
            n = dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", n=3, k=16, rows_per_band=4,
                threshold=0.2, max_bucket_size=cap,
            ).count()
            out[f"minhash_cap{cap}"] = {
                "sec": round(time.time() - t0, 2), "pairs": n,
            }
        for cap in (None, 200, 50):
            t0 = time.time()
            n = dedup.jaccard_pairs(
                docs, "doc_id", "text", 3, 0.2, max_shingle_freq=cap
            ).count()
            out[f"jaccard_freq{cap}"] = {
                "sec": round(time.time() - t0, 2), "pairs": n,
            }
        print(json.dumps({"sf": sf, "pairs_probe": out}), flush=True)


def ingest_loop() -> None:
    """Composed CorpusState.ingest loop at sf0.1 → sf≈1: 4 batches with
    checkpoint() every 2 — per-batch wall time must stay FLAT across
    batches (the lineage-truncation cadence defeats the iterative-lineage
    trap), and the whole loop must scale ~linearly in data.  Run in a
    process that did NOT build (see module docstring)."""
    from go_streaming_spark.functions.corpus_state import CorpusState
    from go_streaming_spark.session import get_session

    spark = get_session("scale-sweep-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    for sf, sf_dir in [(0.1, SRC), (1.0, DST)]:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        corpus = docs.filter(F.col("doc_id") % 10 == 0)
        t0 = time.time()
        st = CorpusState.build(corpus, "doc_id", "text").checkpoint()
        out = {"build_sec": round(time.time() - t0, 2)}
        for b in range(4):
            batch = docs.filter(
                (F.col("doc_id") % 10 != 0)
                & ((F.col("doc_id") / 10).cast("long") % 4 == b)
            )
            t0 = time.time()
            # ingest_clean = ingest + span REMOVAL: the token agg forces
            # the cut text to materialize, so the removal stage is timed
            clean, st = st.ingest_clean(batch, "doc_id", "text", threshold=0.2)
            row = clean.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.size(F.filter(F.split("text", r"\s+"), lambda w: w != ""))
                ).alias("toks"),
                F.sum("dup_span_tokens").alias("cut"),
            ).head()
            n, sec = row.n, round(time.time() - t0, 2)
            if b % 2 == 1:
                t1 = time.time()
                st = st.checkpoint()
                out[f"ckpt{b}_sec"] = round(time.time() - t1, 2)
            out[f"batch{b}"] = {
                "sec": sec, "survivors": n,
                "kept_tokens": int(row.toks or 0),
                "cut_tokens": int(row.cut or 0),
            }
        print(json.dumps({"sf": sf, "ingest_loop": out}), flush=True)


def main() -> None:
    from go_streaming_spark.session import get_session
    import __spark_entry__ as entry_mod

    if "--pairs" in sys.argv:
        pairs_decade()
        return
    if "--ingest-loop" in sys.argv:
        ingest_loop()
        return
    spark = get_session("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    if "--build" in sys.argv:
        build(spark)
        return
    if "--build10" in sys.argv:
        build10(spark)
        return

    qs = entry_mod.queries()
    only = [a for a in sys.argv[1:] if not a.startswith("--")]
    names = [n for n in QUERIES if not only or n in only]
    for sf, sf_dir in [(0.01, "/root/testdata/sf0.01"), (0.1, SRC), (1.0, DST)]:
        times, rows = {}, {}
        for name in names:
            t0 = time.time()
            rows[name] = qs[name](spark, sf_dir).count()
            times[name] = round(time.time() - t0, 3)
        print(json.dumps({"sf": sf, "sec": times, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
