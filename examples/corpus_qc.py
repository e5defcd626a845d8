"""Late-round-8 showcase: the corpus QC / release-gating stack —

    data-quality expectations + FK orphan audit (orders/customer)
    -> PII exposure audit -> frozen linear quality scoring
    -> leakage-safe (dedup-aware) train/val/test split
    -> deterministic negative sampling -> batched kNN join
    -> small-file compaction of the blessed output

the checks a corpus goes through BEFORE training ever sees it; every
stage a composable DataFrame transform (physical notes in SCALE.md).

Run: python examples/corpus_qc.py [sf_dir]  (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.functions import dedup, similarity, text
from go_streaming_spark.functions.dq import check_expectations, fk_violations
from go_streaming_spark.functions.sampling import (
    bucketed_negative_samples,
    leakage_safe_split,
)
from go_streaming_spark.session import get_session
from go_streaming_spark.sources.formats import compact_small_files


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-corpus-qc", cores=8)
    engine = Engine(spark, sf_dir=sf_dir)
    docs = engine.stream("documents")
    emb = engine.stream("embeddings")
    orders, cust = engine.stream("orders"), engine.stream("customer")

    # 1. mechanical validation: every rule rides ONE scan; FK = one join
    report = check_expectations(
        orders,
        {
            "totalprice_positive": F.col("o_totalprice") > 0,
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
    ).unionByName(fk_violations(orders, "o_custkey", cust, "c_custkey"))
    report.show(truncate=False)

    # 2. PII exposure: which sources need scrubbing before release?
    pii = text.pii_hit_counts(docs, "doc_id", "text", carry=["source"])
    pii.groupBy("source").agg(
        F.sum("n_pii").alias("hits"),
        F.sum((F.col("n_pii") > 0).cast("int")).alias("docs_with_pii"),
    ).orderBy(F.desc("hits")).show(5)

    # 3. model-based quality gate: map-only margin scoring
    scored = text.hashed_linear_score(docs, "doc_id", "text")
    kept = scored.filter(F.col("score_q") > 0)
    print(f"quality gate keeps {kept.count()} / {docs.count()}")

    # 4. leakage-safe split: near-dup components never straddle the cut
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, k=16, rows_per_band=4, threshold=0.2
    )
    split = leakage_safe_split(
        docs, "doc_id", pairs.select("id_a", "id_b"),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    split.groupBy("split").count().orderBy("split").show()

    # 5. contrastive pairs: deterministic negatives + exact kNN positives
    negs = bucketed_negative_samples(docs, "doc_id", k=2, n_buckets=8)
    print(f"negative pairs: {negs.count()}")
    probes = emb.filter(F.col("vec_id") % 17 == 3)
    knn = similarity.knn_join(probes, emb, "vec_id", "embedding", k=3)
    knn.show(6)

    # 6. release hygiene: compact the blessed split into target-size files
    with tempfile.TemporaryDirectory(prefix="corpus_qc_") as tmp:
        frag = f"{tmp}/train_fragmented"
        split.filter(F.col("split") == "train").repartition(16).write.parquet(frag)
        n = compact_small_files(spark, frag, f"{tmp}/train", target_bytes=1 << 30)
        print(f"compacted 16 fragments -> {n} file(s)")

    spark.stop()


if __name__ == "__main__":
    main()
