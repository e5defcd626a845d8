"""Beyond-reference showcase: a training-data pipeline over the driver's
``documents`` and ``embeddings`` tables — quality filtering, exact +
near-duplicate removal, and similarity search, all as composable DataFrame
stages.

Run: python examples/llm_pipeline.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.functions import dedup, similarity, text
from go_streaming_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-llm-pipeline", cores=8)
    engine = Engine(spark, sf_dir=sf_dir)
    docs = engine.stream("documents")

    # 1. quality gate: keep docs with enough words and mostly-alpha content
    quality = text.quality_score(docs, "doc_id", "text")  # id column: "id"
    keep = quality.filter((F.col("n_words") >= 5) & (F.col("alpha_ratio") > 0.5))
    docs_kept = docs.join(
        keep.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
    )
    print(f"quality gate: {docs.count()} -> {docs_kept.count()} docs")

    # 2. exact dedup: one survivor per identical text
    exact = dedup.exact_dedup(docs_kept, "doc_id", ["text"])
    survivors = exact.filter(F.col("n_copies") > 1)
    print(f"exact dedup: {survivors.count()} hash groups had copies")

    # 3. near-dup sweep (MinHash + LSH, verified Jaccard >= 0.4)
    near = dedup.minhash_lsh_pairs(docs_kept, "doc_id", "text", threshold=0.4)
    print(f"near-dup pairs (jaccard >= 0.4): {near.count()}")

    # 4. similarity search: top-5 neighbors of the first embedding
    emb = engine.stream("embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    topk = similarity.cosine_topk(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", qv, 5
    )
    print("nearest neighbors of vec 0:")
    for row in topk.collect():
        print(f"  vec {row['id']}  cos={row['cos_sim']:.4f}")
    engine.close()
    spark.stop()


if __name__ == "__main__":
    main()
