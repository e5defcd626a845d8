#!/usr/bin/env python
"""Dump explain('formatted') for the round-15 optimization targets into
plans/r15/<name>_<tag>.txt.  For lifecycle gates whose returned frame is a
LocalTableScan (the gate collects internally), the INTERNAL heavy frames
are dumped instead — noted in the file header.

    python tools/dump_r15_plans.py before|after [--sf DIR] [--only NAME ...]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_streaming_spark.session import get_session  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r15")


def _dump(tag, name, header, frames):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(f"# {name} ({tag})\n# {header}\n")
        for label, df in frames:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            fh.write(f"\n## {label}\n{buf.getvalue()}")
    print(f"wrote {path}")


def plans_query_frame(qname, header):
    def fn(spark, sf_dir, tag):
        from go_streaming_spark.queries import QUERIES
        out = QUERIES[qname](spark, sf_dir)
        _dump(tag, qname, header, [("query frame", out)])
    return fn


def plans_scores_wide(spark, sf_dir, tag):
    # the gate trains/verifies internally and returns a literal row;
    # dumped: the distributed frames the gate executes — the sparse gram
    # aggregation it trains from and the margin-aggregate scoring frame.
    import numpy as np
    from go_streaming_spark.functions.stats import (
        gram_matrix_exploded, ridge_fit_from_gram)
    from go_streaming_spark.functions.text import hashed_bucket_entries
    from go_streaming_spark.queries_llm import _docs

    k, lam = 1024, 1.0
    docs = _docs(spark, sf_dir)
    ent = hashed_bucket_entries(docs, "doc_id", "text", k=k, seed="probe")
    lab = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
    )
    joined = ent.join(lab, "id").localCheckpoint()
    gram = gram_matrix_exploded(joined, "entries", k, "y")
    w = ridge_fit_from_gram(gram.collect(), k, lam=lam)
    w_q = np.floor(w * 1e6 + 0.5).astype(np.int64)
    w_lit = "array(" + ",".join(f"{int(v)}L" for v in w_q) + ")"
    margins = joined.select(
        F.expr(
            f"aggregate(entries, 0L, (acc, e) -> acc + e.x *"
            f" element_at({w_lit}, CAST(e.i + 1 AS INT)))"
        ).alias("margin_q"),
        "n_tokens",
        F.when(F.col("entries").isNotNull(), F.size("entries"))
        .cast("long").alias("nnz"),
    )
    agg = margins.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.sum("nnz").alias("sum_nnz"),
        F.count("margin_q").alias("n_margins"),
        F.sum("margin_q").alias("sum_margin"),
        F.min("margin_q").alias("min_margin"),
        F.max("margin_q").alias("max_margin"),
    )
    _dump(tag, "quality_linear_scores_wide",
          "gate returns a literal row; dumped: the sparse-gram training"
          " aggregate and the distributed margin-scoring aggregate (the"
          " gate's two heavy frames)",
          [("sparse gram", gram), ("margin aggregates", agg)])


def plans_kmeans_fit(spark, sf_dir, tag):
    # kmeans_fit collects bounded partials per Lloyd iteration; dumped:
    # the per-iteration mapInPandas partials frame (shows whether the
    # iteration re-scans parquet + re-quantizes, or reads a materialized
    # quantized base).
    from go_streaming_spark.functions import clustering
    from go_streaming_spark.queries_llm import _emb
    emb = _emb(spark, sf_dir)
    init = clustering.anchor_centroids_q(emb, "vec_id", "embedding", k=8)
    frame = clustering.kmeans_fit(
        emb, "vec_id", "embedding", init, iters=1, _explain_frame=True)
    _dump(tag, "kmeans_lloyd_centroids",
          "gate collects internally; dumped: ONE Lloyd iteration's fused"
          " E-step + per-partition-partials frame",
          [("iteration partials", frame)])


DUMPS = {
    "ann_pq_adc_topk": plans_query_frame(
        "ann_pq_adc_topk", "returned frame IS the encode+ADC top-k plan"),
    "quality_linear_scores_wide": plans_scores_wide,
    "corpus_ingest_survivors": plans_query_frame(
        "corpus_ingest_survivors",
        "returned frame IS the full lazy ingest plan (exact dedup ->"
        " LSH vs index -> verify -> CC -> span join)"),
    "corpus_ingest_clean_tokens": plans_query_frame(
        "corpus_ingest_clean_tokens",
        "returned frame IS the full lazy ingest_clean plan"),
    "dedup_incremental_bloom": plans_query_frame(
        "dedup_incremental_bloom",
        "returned frame IS the bloom-prefiltered anti-join plan (the"
        " bloom BUILD is a separate query-build-time job; see the"
        " bloom-build frame below)"),
    "kmeans_lloyd_centroids": plans_kmeans_fit,
}


def plans_bloom_build(spark, sf_dir, tag):
    from go_streaming_spark.functions import sketch as sk
    from go_streaming_spark.queries_llm import _docs
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 == 0)
    dig = corpus.select(F.md5(F.col("text")).alias("content_hash"))
    bloom = sk.bloom_build(dig, "content_hash")
    _dump(tag, "bloom_build",
          "the query-build-time bloom BUILD frame inside"
          " dedup_incremental_bloom (collected to the driver by"
          " bloom_maybe_contains)",
          [("bloom build", bloom)])


DUMPS["bloom_build"] = plans_bloom_build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    spark = get_session("dump_r15_plans")
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401
    for name, fn in DUMPS.items():
        if args.only and name not in args.only:
            continue
        fn(spark, args.sf, args.tag)
    spark.stop()


if __name__ == "__main__":
    main()
