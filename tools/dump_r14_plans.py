#!/usr/bin/env python
"""Dump explain('formatted') for the round-14 optimization targets into
plans/r14/<name>_<tag>.txt.  For lifecycle gates whose returned frame is a
LocalTableScan (the gate collects internally), the INTERNAL heavy frames
are dumped instead — noted in the file header.

    python tools/dump_r14_plans.py before|after [--sf DIR]
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
    os.path.abspath(__file__))), "plans", "r14")


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


def plans_pca_parseval(spark, sf_dir, tag):
    from go_streaming_spark.queries import QUERIES
    out = QUERIES["embedding_pca_parseval"](spark, sf_dir)
    _dump(tag, "embedding_pca_parseval",
          "returned frame IS the full lazy projection+ssq plan",
          [("query frame", out)])


def plans_whitened_qc(spark, sf_dir, tag):
    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries_llm import _emb
    emb = _emb(spark, sf_dir)
    moments = similarity.embedding_second_moments(
        emb, "embedding", dim=64, augmented=True).collect()
    vals, comps, mu, n = similarity.pca_from_augmented(moments, dim=64, k=64)
    z = similarity.pca_whiten(emb, "embedding", comps, vals, mu)
    per_c = (
        z.select(F.posexplode("z").alias("c", "zc"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("zc").alias("s1"),
             F.sum(F.col("zc") * F.col("zc")).alias("s2")))
    _dump(tag, "embedding_whitened_qc",
          "gate returns a literal row; dumped: the whiten-z per-component"
          " moment frame (the query's distributed pass)",
          [("whiten z + per-component moments", per_c)])


def plans_kmeans_assign(spark, sf_dir, tag):
    from go_streaming_spark.functions import clustering
    from go_streaming_spark.queries_llm import _emb
    emb = _emb(spark, sf_dir)
    cents = clustering.anchor_centroids_q(emb, "vec_id", "embedding", k=8)
    asg = clustering.kmeans_assign_q(emb, "vec_id", "embedding", cents,
                                     keep_q=True)
    g = asg.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.min("id").alias("min_id"),
        F.sum(F.expr("aggregate(_qb, 0L, (acc, v) -> acc + v)"))
        .alias("comp_sum"))
    _dump(tag, "kmeans_cluster_stats",
          "returned frame: assignment + per-cluster stats (the"
          " kmeans_assign_q physical path)",
          [("assignment + cluster stats", g)])


def plans_ivf_rebuild_assign(spark, sf_dir, tag):
    import shutil
    import tempfile
    from go_streaming_spark.functions import similarity, clustering
    from go_streaming_spark.queries_llm import _emb
    emb = _emb(spark, sf_dir)
    corpus = emb.filter(F.col("vec_id") != 0)
    cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
    tmp = tempfile.mkdtemp(prefix="plan_ivf_")
    try:
        similarity.save_ivf_index(
            corpus, "vec_id", "embedding", "label", cent, f"{tmp}/e0")
        vecs = spark.read.parquet(f"{tmp}/e0/vectors")
        init = clustering.anchor_centroids_q(
            vecs, "vec_id", "embedding", 10, 17, 3)
        cents = clustering.kmeans_fit(vecs, "vec_id", "embedding", init, 1)
        reassigned = clustering.kmeans_assign_q(
            vecs, "vec_id", "embedding", cents, payload_cols=("embedding",))
        _dump(tag, "ann_ivf_manifest_topk",
              "gate collects internally; dumped: the rebuild re-assignment"
              " frame (kmeans_assign_q with vector payload) that feeds the"
              " e1 snapshot write",
              [("rebuild re-assignment", reassigned)])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


DUMPS = {
    "embedding_pca_parseval": plans_pca_parseval,
    "embedding_whitened_qc": plans_whitened_qc,
    "kmeans_cluster_stats": plans_kmeans_assign,
    "ann_ivf_manifest_topk": plans_ivf_rebuild_assign,
}


def plans_ingest_survivors(spark, sf_dir, tag):
    from go_streaming_spark.queries import QUERIES
    out = QUERIES["corpus_ingest_survivors"](spark, sf_dir)
    _dump(tag, "corpus_ingest_survivors",
          "returned frame IS the full lazy ingest plan (exact dedup ->"
          " LSH vs index -> verify -> CC -> span join)",
          [("query frame", out)])


def plans_pq_adc(spark, sf_dir, tag):
    from go_streaming_spark.queries import QUERIES
    out = QUERIES["ann_pq_adc_topk"](spark, sf_dir)
    _dump(tag, "ann_pq_adc_topk",
          "returned frame IS the encode+ADC top-k plan",
          [("query frame", out)])


DUMPS["corpus_ingest_survivors"] = plans_ingest_survivors
DUMPS["ann_pq_adc_topk"] = plans_pq_adc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    spark = get_session("dump_r14_plans")
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401
    for name, fn in DUMPS.items():
        if args.only and name not in args.only:
            continue
        fn(spark, args.sf, args.tag)
    spark.stop()


if __name__ == "__main__":
    main()
