"""(Beyond reference) The production ANN lifecycle over a persisted,
partition-pruned IVF index — the full loop a vector corpus runs at scale:

  build → probe (reads ONLY nprobe inverted lists) → append batches
  (files land inside their cluster partitions; corpus never rewritten)
  → cell-imbalance audit (append never re-clusters, so skew is what
  silently degrades pruning) → threshold trips → REBUILD (deterministic
  quantized Lloyd re-train + full re-assign, written to a NEW path — the
  live index serves until the snapshot flips) → probe the rebuilt layout.

Run: python examples/ann_lifecycle.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.functions import similarity
from go_streaming_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("ann-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    corpus = emb.filter(F.col("vec_id") != 0)
    cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)

    root = tempfile.mkdtemp(prefix="ann_lifecycle_")
    idx, idx2 = f"{root}/v1", f"{root}/v2"
    try:
        # 1. snapshot: vectors partitionBy(cluster), one file per cluster
        similarity.save_ivf_index(
            corpus, "vec_id", "embedding", "label", cent, idx
        )

        # 2. serve: the probe scans only nprobe inverted lists
        print("top-3 (pruned probe, nprobe=2):")
        similarity.ivf_pruned_topk(
            spark, idx, "vec_id", "embedding", "label", qv, k=3, nprobe=2
        ).show()

        # 3. ingest: skewed appends — every batch lands in one cluster
        hot = corpus.limit(100).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "embedding",
            F.lit(0).alias("label"),
        )
        for i in range(3):
            similarity.append_ivf_vectors(
                hot.withColumn("vec_id", F.col("vec_id") + i * 10_000),
                "vec_id", "embedding", "label", idx,
            )

        # 4. audit: per-inverted-list counts vs the mean
        print("cell stats after skewed appends:")
        similarity.ivf_cell_stats(spark, idx, "label").orderBy(
            F.col("ratio_to_mean").desc()
        ).show(5)
        trips = similarity.ivf_needs_rebuild(spark, idx, "label", max_ratio=2.0)
        print(f"needs_rebuild(max_ratio=2.0) -> {trips}")

        # 5. rebuild to a NEW path; v1 keeps serving until the flip
        if trips:
            similarity.rebuild_ivf_index(
                spark, idx, idx2, "vec_id", "embedding", "label",
                k=8, iters=3,
            )
            print("worst cell after rebuild:")
            similarity.ivf_cell_stats(spark, idx2, "label").orderBy(
                F.col("ratio_to_mean").desc()
            ).show(1)
            print("top-3 over the rebuilt layout:")
            similarity.ivf_pruned_topk(
                spark, idx2, "vec_id", "embedding", "label", qv,
                k=3, nprobe=2,
            ).show()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
