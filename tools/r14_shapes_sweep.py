#!/usr/bin/env python
"""Round-14 scale sweeps — the two r13 lifecycle gates VERDICT r13 item 8
asked for, plus the r14 registrations.  One probe per process (the
scale_sweep.py isolation rule: back-to-back sf≈1 heavies in one JVM
cross-inflate via GC pressure).

    python tools/r14_shapes_sweep.py stream_ivf     # streaming ANN append: cost ∝ batch, files flat
    python tools/r14_shapes_sweep.py stream_ingest  # per-trigger ingest wall vs the batch twin
    python tools/r14_shapes_sweep.py gram_wide      # k=1024 gram + end-to-end train->score loop
    python tools/r14_shapes_sweep.py manifest       # snapshot flip: per-epoch cost vs probe-through
    python tools/r14_shapes_sweep.py filtered       # filtered ANN: early-stop + full-walk regimes
    python tools/r14_shapes_sweep.py pca            # moments/pca/shards + impl A/B + synthetic 2M rows

Each prints one JSON line per scale.  Requires /tmp/scale_sf1 (built by
``python tools/scale_sweep.py --build``).  Timings are min-of-N end-to-end
in a quiet window; the sf0.1 pass doubles as JIT warm-up.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/scale_sf1"
SCALES = [(0.1, SRC), (1.0, DST)]


def _session(name):
    from go_streaming_spark.session import get_session

    spark = get_session(name)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _min_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _vec_files(idx):
    return len(glob.glob(f"{idx}/vectors/*/*.parquet"))


def stream_ivf() -> None:
    """stream_ann_ivf_append decomposed per scale: seed the IVF layout
    from a third of the corpus, replay the rest as two micro-batches,
    and measure (a) wall per append trigger — the claim: cost ∝ BATCH
    size, the corpus is never rewritten — and (b) parquet file count
    added per append — the claim: ≈ clusters touched per batch (the
    repartition-on-cluster write), NOT tasks × clusters, and flat as
    the corpus grows."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity

    spark = _session("r14_stream_ivf")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        ]
        corpus = emb.filter(F.col("vec_id") != 0)
        cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
        nclusters = cent.count()
        tmp = tempfile.mkdtemp(prefix=f"r14sivf_{sf}_")
        idx = f"{tmp}/index"
        try:
            t0 = time.time()
            similarity.save_ivf_index(
                corpus.filter(F.col("vec_id") % 3 == 0),
                "vec_id", "embedding", "label", cent, idx,
            )
            seed_s = round(time.time() - t0, 3)
            files = [_vec_files(idx)]
            appends = []
            for rem in (1, 2):
                b = corpus.filter(F.col("vec_id") % 3 == rem)
                t0 = time.time()
                similarity.append_ivf_vectors(
                    b, "vec_id", "embedding", "label", idx
                )
                appends.append(round(time.time() - t0, 3))
                files.append(_vec_files(idx))
            probe_s = _min_of(
                3,
                lambda: similarity.ivf_pruned_topk(
                    spark, idx, "vec_id", "embedding", "label", qv,
                    k=10, nprobe=2,
                ).collect(),
            )
            n = corpus.count()
            print(json.dumps({
                "shape": "stream_ann_ivf_append", "sf": sf, "rows": n,
                "clusters": nclusters, "seed_write_s": seed_s,
                "append_s": appends,
                "files_after": files,
                "files_added_per_append": [
                    files[i + 1] - files[i] for i in range(len(files) - 1)
                ],
                "probe_nprobe2_s": probe_s,
            }), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def stream_ingest() -> None:
    """stream_corpus_ingest_survivors vs its batch twin per scale: the
    streaming replay (one file per trigger through foreachBatch +
    CorpusState.ingest) should cost ≈ the batch twin plus per-trigger
    overhead — micro-batching IS the delivery engine, not a second
    execution model."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401

    spark = _session("r14_stream_ingest")
    for sf, sf_dir in SCALES:
        t0 = time.time()
        batch_rows = QUERIES["corpus_ingest_two_batch_survivors"](
            spark, sf_dir
        ).count()
        batch_s = round(time.time() - t0, 3)
        t0 = time.time()
        stream_rows = QUERIES["stream_corpus_ingest_survivors"](
            spark, sf_dir
        ).count()
        stream_s = round(time.time() - t0, 3)
        print(json.dumps({
            "shape": "stream_corpus_ingest_survivors", "sf": sf,
            "batch_twin_s": batch_s, "stream_s": stream_s,
            "stream_over_batch": round(stream_s / batch_s, 2),
            "rows": stream_rows, "rows_match_twin": stream_rows == batch_rows,
        }), flush=True)
    spark.stop()


def gram_wide() -> None:
    """The r14 realistic-width training registrations per scale: the
    k=1024 sparse gram (one explode + one map-side-combined groupBy —
    work Σ nnz², state = observed cells) and the END-TO-END
    train->score loop (gram -> driver ridge solve -> distributed int64
    scoring + the exact numpy verification harness)."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401

    spark = _session("r14_gram_wide")
    for sf, sf_dir in SCALES:
        gram_s = _min_of(
            3,
            lambda: QUERIES["quality_probe_gram_wide"](spark, sf_dir)
            .write.mode("overwrite").format("noop").save(),
        )
        loop_s = _min_of(
            3,
            lambda: QUERIES["quality_linear_scores_wide"](spark, sf_dir)
            .write.mode("overwrite").format("noop").save(),
        )
        print(json.dumps({
            "shape": "gram_wide_k1024", "sf": sf,
            "gram_wide_s": gram_s, "train_score_loop_s": loop_s,
        }), flush=True)
    spark.stop()


def manifest() -> None:
    """ann_ivf_manifest_topk decomposed per scale: the per-EPOCH cost
    (save + rebuild + publish — amortized over every query between
    snapshots) vs the per-QUERY probe THROUGH the manifest — the claim:
    the manifest adds one tiny parquet read and the probe stays flat as
    the corpus grows (partition pruning through the resolved path)."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity

    spark = _session("r14_manifest")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        ]
        corpus = emb.filter(F.col("vec_id") != 0)
        cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
        tmp = tempfile.mkdtemp(prefix=f"r14man_{sf}_")
        try:
            t0 = time.time()
            similarity.save_ivf_index(
                corpus, "vec_id", "embedding", "label", cent, f"{tmp}/e0"
            )
            similarity.publish_ivf_epoch(spark, tmp, f"{tmp}/e0", epoch=0)
            epoch0_s = round(time.time() - t0, 3)
            t0 = time.time()
            similarity.rebuild_ivf_index(
                spark, f"{tmp}/e0", f"{tmp}/e1", "vec_id", "embedding",
                "label", k=10, iters=3,
            )
            similarity.publish_ivf_epoch(spark, tmp, f"{tmp}/e1", epoch=1)
            epoch1_s = round(time.time() - t0, 3)
            probe_s = _min_of(
                5,
                lambda: similarity.ivf_manifest_topk(
                    spark, tmp, "vec_id", "embedding", "label", qv,
                    k=10, nprobe=2,
                ).collect(),
            )
            print(json.dumps({
                "shape": "ann_ivf_manifest", "sf": sf,
                "rows": corpus.count(),
                "epoch0_save_publish_s": epoch0_s,
                "epoch1_rebuild_publish_s": epoch1_s,
                "probe_through_manifest_s": probe_s,
            }), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def filtered() -> None:
    """ivf_filtered_topk per scale, both regimes: a selective predicate
    that still yields >= k matches (escalation stops early — the probe
    reads a ranked PREFIX of cells) and an ultra-selective one (< k
    matches anywhere — escalation walks ALL cells, the exact-brute-force
    regime).  The claim: cost is bounded by cells actually probed, not
    corpus size, and the early-stop regime stays flat at 10×."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity

    spark = _session("r14_filtered")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
        ]
        corpus = emb.filter(F.col("vec_id") != 0)
        cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
        tmp = tempfile.mkdtemp(prefix=f"r14filt_{sf}_")
        try:
            similarity.save_ivf_index(
                corpus, "vec_id", "embedding", "label", cent, tmp
            )
            res = {"shape": "ann_filtered_topk", "sf": sf,
                   "rows": corpus.count()}
            for tag, pred in (
                ("early_stop", F.col("vec_id") % 101 == 3),
                ("full_walk", F.col("vec_id") % 3001 == 3),
            ):
                res[f"{tag}_matches"] = corpus.filter(pred).count()
                res[f"{tag}_probe_s"] = _min_of(
                    3,
                    lambda: similarity.ivf_filtered_topk(
                        spark, tmp, "vec_id", "embedding", "label", qv,
                        pred, k=10, nprobe=2,
                    ).collect(),
                )
            print(json.dumps(res), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def pca() -> None:
    """embedding_second_moments / pca_embed / write_training_shards per
    scale.  The claims: the moment statistic's collected state is FIXED
    (2080 cells) whatever the corpus, its wall grows at most linearly
    (one map-side-combined groupBy over Σ nnz² products), the projection
    is a map-only pass, and the shard write is the one range shuffle any
    global-order write pays."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity
    from go_streaming_spark.sources.formats import write_training_shards

    spark = _session("r14_pca")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        res = {"shape": "pca_and_shards", "sf": sf, "rows": emb.count()}
        res["moments_s"] = _min_of(
            3,
            lambda: similarity.embedding_second_moments(
                emb, "embedding", dim=64
            ).collect(),
        )
        res["pca_embed_s"] = _min_of(
            3,
            lambda: similarity.pca_embed(
                emb, "vec_id", "embedding", dim=64, k=8
            )[0].select(F.sum(F.element_at("pc", 1))).collect(),
        )
        keyed = docs.select(
            "doc_id",
            F.md5(F.concat_ws("|", F.lit("shards"),
                              F.col("doc_id").cast("string"))).alias("skey"),
            "text",
        )

        def _write():
            tmp = tempfile.mkdtemp(prefix=f"r14shards_{sf}_")
            try:
                m = write_training_shards(
                    keyed, f"{tmp}/s", "skey", target_bytes=256 << 10,
                    mode="overwrite",
                ).collect()
                res["n_shards"] = len(m)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)

        res["shard_write_s"] = _min_of(3, _write)
        print(json.dumps(res), flush=True)

    # the real linearity claim needs data past stage-latency noise:
    # deterministic synthetic corpora at 200k and 2M rows (10×), both
    # moment impls A/B'd — the statistic's collected state is 2080
    # cells at EVERY size
    def _synth(n):
        return spark.range(n).select(
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: (
                    F.hash(F.col("id") * F.lit(64) + d).cast("double")
                    / F.lit(2.147483648e9)
                ),
            ).alias("embedding")
        )

    from go_streaming_spark.functions.util import spread

    for n in (200_000, 2_000_000):
        corp = spread(_synth(n)).localCheckpoint()
        res = {"shape": "moments_synth", "rows": n}
        impls = ("pandas", "expr") if n <= 200_000 else ("pandas",)
        for impl in impls:
            res[f"moments_{impl}_s"] = _min_of(
                2,
                lambda: similarity.embedding_second_moments(
                    corp, "embedding", dim=64, impl=impl
                ).collect(),
            )
        corp.unpersist()
        print(json.dumps(res), flush=True)
    spark.stop()


def drift() -> None:
    """The late-r14 drift-family registrations per scale: grouped
    moment cells + SMD derivation (bounded-statistic claim), PSI
    (map-side-combined pivot, bounded shuffles), char entropy
    (map-only, linear in bytes — the correct shape), and the
    grouped-stats + PSI streaming twins (flat per-trigger state)."""
    from go_streaming_spark.functions import similarity
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_llm  # noqa: F401
    import go_streaming_spark.queries_ext  # noqa: F401

    spark = _session("r14_drift")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        res = {"shape": "drift_family", "sf": sf, "rows": emb.count()}
        stats = similarity.embedding_dim_stats_by(
            emb, "label", "embedding", dim=64
        )
        res["dim_stats_by_s"] = _min_of(3, lambda: stats.count())
        res["smd_s"] = _min_of(
            3, lambda: similarity.smd_from_dim_stats(stats, 3, 7).collect()
        )
        for q in ("value_psi_by_type", "value_psi_ref_bins",
                  "doc_char_entropy",
                  "stream_embedding_dim_stats_by_label",
                  "stream_value_psi_by_type"):
            n = 2 if q.startswith("stream_") else 3
            res[f"{q}_s"] = _min_of(
                n, lambda q=q: QUERIES[q](spark, sf_dir).count()
            )
        print(json.dumps(res), flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    fn = {
        "stream_ivf": stream_ivf,
        "stream_ingest": stream_ingest,
        "gram_wide": gram_wide,
        "manifest": manifest,
        "filtered": filtered,
        "pca": pca,
        "drift": drift,
    }.get(cmd)
    if fn is None:
        print(__doc__)
        sys.exit(2)
    fn()
