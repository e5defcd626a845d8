#!/usr/bin/env python
"""Sub-step wall-clock profile of the heavy lifecycle queries — guide §1
(empirical loop): which internal action/write inside each composed gate
actually burns the time at bench scale.  Mirrors each query body with
perf_counter fences around every action; results are NOT oracle-checked
here (drive_entry.py owns that) — this is a timing lens only.

    python tools/profile_substeps.py [--sf DIR] name [name ...]

Names: ivf_manifest, whitened_qc, pca_parseval, filtered_ann,
ingest, ingest_bucketed, kmeans_fit
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from go_streaming_spark.session import get_session  # noqa: E402


class Fence:
    def __init__(self):
        self.rows = []
        self.t = time.perf_counter()

    def lap(self, label):
        now = time.perf_counter()
        self.rows.append((label, now - self.t))
        self.t = now

    def report(self, name):
        total = sum(d for _, d in self.rows)
        print(f"\n=== {name}  total {total:.2f}s ===")
        for label, d in self.rows:
            print(f"  {d:7.3f}s  {label}")


def prof_ivf_manifest(spark, sf_dir):
    import shutil
    import tempfile

    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries_llm import _emb

    fz = Fence()
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    corpus = emb.filter(F.col("vec_id") != 0)
    fz.lap("load + query-vec head()")
    cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
    tmp = tempfile.mkdtemp(prefix="prof_ivf_")
    try:
        similarity.save_ivf_index(
            corpus, "vec_id", "embedding", "label", cent, f"{tmp}/e0")
        fz.lap("save_ivf_index e0 (write)")
        similarity.publish_ivf_epoch(spark, tmp, f"{tmp}/e0", epoch=0)
        fz.lap("publish e0")
        from go_streaming_spark.functions import clustering
        vecs = spark.read.parquet(f"{tmp}/e0/vectors")
        init = clustering.anchor_centroids_q(vecs, "vec_id", "embedding", 10, 17, 3)
        fz.lap("rebuild: anchor_centroids_q")
        cents = clustering.kmeans_fit(vecs, "vec_id", "embedding", init, 3)
        fz.lap("rebuild: kmeans_fit x3")
        reassigned = clustering.kmeans_assign_q(
            vecs, "vec_id", "embedding", cents, payload_cols=("embedding",)
        ).select(
            F.col("id").alias("vec_id"), F.col("embedding"),
            F.col("cluster").alias("label"))
        cents_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            "label int, vec array<double>")
        similarity.save_ivf_index(
            reassigned, "vec_id", "embedding", "label", cents_df, f"{tmp}/e1")
        fz.lap("rebuild: assign + save e1 (write)")
        similarity.publish_ivf_epoch(spark, tmp, f"{tmp}/e1", epoch=1)
        similarity.current_ivf_epoch(spark, tmp)
        fz.lap("publish e1 + manifest read")
        out = similarity.ivf_manifest_topk(
            spark, tmp, "vec_id", "embedding", "label", qv, k=10, nprobe=10)
        rows = out.collect()
        fz.lap(f"probe + collect ({len(rows)} rows)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    fz.report("ann_ivf_manifest_topk")


def prof_whitened_qc(spark, sf_dir):
    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries_llm import _emb

    fz = Fence()
    emb = _emb(spark, sf_dir)
    moments = similarity.embedding_second_moments(
        emb, "embedding", dim=64, augmented=True).collect()
    fz.lap("second_moments (mapInPandas) + collect")
    vals, comps, mu, n = similarity.pca_from_augmented(moments, dim=64, k=64)
    fz.lap("driver eigh")
    z = similarity.pca_whiten(emb, "embedding", comps, vals, mu)
    per_c = (
        z.select(F.posexplode("z").alias("c", "zc"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("zc").alias("s1"),
             F.sum(F.col("zc") * F.col("zc")).alias("s2"))
        .collect())
    fz.lap(f"whiten z + posexplode groupBy collect ({len(per_c)} comps)")
    fz.report("embedding_whitened_qc")


def prof_pca_parseval(spark, sf_dir):
    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries_llm import _emb

    fz = Fence()
    emb = _emb(spark, sf_dir)
    proj, _vals = similarity.pca_embed(emb, "vec_id", "embedding", dim=64, k=64)
    fz.lap("pca_embed (moments+eigh, lazy projection)")
    ssq = F.aggregate(F.col("pc"), F.lit(0.0), lambda acc, s: acc + s * s)
    out = proj.select(
        "vec_id", (F.floor(ssq * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)).alias("ssq"))
    out.write.mode("overwrite").format("noop").save()
    fz.lap("projection + ssq noop write")
    fz.report("embedding_pca_parseval")


def prof_filtered_ann(spark, sf_dir):
    import shutil
    import tempfile

    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries_llm import _emb

    fz = Fence()
    emb = _emb(spark, sf_dir)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    corpus = emb.filter(F.col("vec_id") != 0)
    cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
    fz.lap("load + qv head")
    tmp = tempfile.mkdtemp(prefix="prof_filt_")
    try:
        similarity.save_ivf_index(corpus, "vec_id", "embedding", "label", cent, tmp)
        fz.lap("save_ivf_index (write)")
        out = similarity.ivf_filtered_topk(
            spark, tmp, "vec_id", "embedding", "label", qv,
            F.col("vec_id") % 101 == 3, k=10, nprobe=2)
        out.count()
        fz.lap("escalating probe (2->4->8->10) + collects")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    fz.report("ann_filtered_topk")


def prof_ingest(spark, sf_dir):
    from go_streaming_spark.functions.corpus_state import CorpusState
    from go_streaming_spark.queries_llm import _docs

    fz = Fence()
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 == 0)
    batch = docs.filter(F.col("doc_id") % 10 != 0)
    state = CorpusState.build(
        corpus, "doc_id", "text", n=3, k=16, rows_per_band=4, gram_k=8)
    fz.lap("CorpusState.build (lazy)")
    clean, _ = state.ingest(batch, "doc_id", "text", threshold=0.2)
    fz.lap("ingest() (incl. survivors localCheckpoint)")
    clean.select("doc_id", "dup_span_tokens").write.mode(
        "overwrite").format("noop").save()
    fz.lap("span join + noop write")
    fz.report("corpus_ingest_survivors")


def prof_kmeans_fit(spark, sf_dir):
    from go_streaming_spark.functions import clustering
    from go_streaming_spark.queries_llm import _emb

    fz = Fence()
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") != 0)
    init = clustering.anchor_centroids_q(emb, "vec_id", "embedding", 10, 17, 3)
    fz.lap("anchor_centroids_q")
    cents = clustering.kmeans_fit(emb, "vec_id", "embedding", init, 3)
    fz.lap("kmeans_fit x3")
    asg = clustering.kmeans_assign_q(emb, "vec_id", "embedding", cents)
    asg.write.mode("overwrite").format("noop").save()
    fz.lap("kmeans_assign_q noop write")
    fz.report("kmeans path")


PROFILES = {
    "ivf_manifest": prof_ivf_manifest,
    "whitened_qc": prof_whitened_qc,
    "pca_parseval": prof_pca_parseval,
    "filtered_ann": prof_filtered_ann,
    "ingest": prof_ingest,
    "kmeans_fit": prof_kmeans_fit,
}


def prof_ingest_fine(spark, sf_dir):
    """Mirror CorpusState._ingest_core stage by stage (timing lens)."""
    from pyspark.sql.window import Window

    from go_streaming_spark.functions import dedup as dd
    from go_streaming_spark.functions.corpus_state import CorpusState
    from go_streaming_spark.queries_llm import _docs

    fz = Fence()
    docs = _docs(spark, sf_dir)
    corpus = docs.filter(F.col("doc_id") % 10 == 0)
    batch = docs.filter(F.col("doc_id") % 10 != 0)
    state = CorpusState.build(
        corpus, "doc_id", "text", n=3, k=16, rows_per_band=4, gram_k=8)
    fz.lap("build (lazy)")
    id_col, text_col, threshold = "doc_id", "text", 0.2
    uniq = (
        batch.withColumn("__h", F.md5(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__h").orderBy(id_col)))
        .filter(F.col("__rn") == 1)
        .join(state.digests.select(F.col("content_hash").alias("__h")),
              "__h", "left_anti")
        .drop("__h", "__rn"))
    uniq.write.mode("overwrite").format("noop").save()
    fz.lap("stage1 exact dedup (noop probe)")
    s1 = dd.incremental_minhash_dedup(
        uniq, None, id_col, text_col, state.n, state.k,
        state.rows_per_band, threshold, index=state.minhash)
    s1.write.mode("overwrite").format("noop").save()
    fz.lap("stage2a batch-vs-corpus minhash (noop probe)")
    survivors = dd.incremental_minhash_dedup_full(
        uniq, None, id_col, text_col, state.n, state.k,
        state.rows_per_band, threshold, index=state.minhash)
    fz.lap("stage2 full (localCheckpoint + in-batch CC loop)")
    spans = dd.duplicated_spans_against_index(
        survivors, state.grams, id_col, text_col, state.gram_k)
    span_tokens = spans.groupBy(F.col("id").alias("__sid")).agg(
        F.sum("span_tokens").alias("dup_span_tokens"))
    clean = (
        survivors.join(span_tokens, survivors[id_col] == F.col("__sid"),
                       "left")
        .withColumn("dup_span_tokens",
                    F.coalesce("dup_span_tokens", F.lit(0)).cast("long"))
        .drop("__sid"))
    clean.select("doc_id", "dup_span_tokens").write.mode(
        "overwrite").format("noop").save()
    fz.lap("stage3 spans vs gram index + final noop")
    fz.report("corpus_ingest_survivors FINE")


PROFILES["ingest_fine"] = prof_ingest_fine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+", choices=sorted(PROFILES))
    args = ap.parse_args()
    spark = get_session("profile_substeps")
    # session warm-up (bench.py protocol): retire JIT/classloading
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401
    for _ in range(2):
        QUERIES["filter_greater"](spark, args.sf).write.mode(
            "overwrite").format("noop").save()
    for name in args.names:
        PROFILES[name](spark, args.sf)
    spark.stop()


if __name__ == "__main__":
    main()
