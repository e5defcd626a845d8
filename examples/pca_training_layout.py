"""(Beyond reference) The final mile of a training-data pipeline:
embedding-space QC and the deterministic training layout.

  second moments (one Arrow-batched pass, 2080-cell state) → driver
  eigendecomposition → explained-variance report → full-rank WHITENING
  (map-only) → Mahalanobis outlier screen (|z|² against a χ²-ish bar)
  → deterministic corpus shuffle key → range-sharded sorted shard
  write + manifest check.

Run: python examples/pca_training_layout.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from go_streaming_spark.functions import similarity
from go_streaming_spark.session import get_session
from go_streaming_spark.sources.formats import write_training_shards

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
DIM = 64


def main() -> None:
    spark = get_session("pca-training-layout")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. one distributed pass each: dim·(dim+1)/2 moment cells + per-dim
    #    sums — the fixed-size sufficient statistic of covariance
    moments = similarity.embedding_second_moments(emb, "embedding", DIM).collect()
    dstats = similarity.embedding_dim_stats(emb, "vec_id", "embedding", DIM).collect()
    vals, comps, mu, n = similarity.pca_from_moments(moments, dstats, DIM, DIM)
    total = float(np.sum(vals))
    top8 = float(np.sum(vals[:8]))
    print(f"corpus: {n} vectors; top-8 components explain "
          f"{100 * top8 / total:.1f}% of variance")

    # 2. whiten (map-only; |z|² IS the Mahalanobis distance² from the
    #    corpus mean) and screen outliers
    z = similarity.pca_whiten(emb, "embedding", comps, vals, mu)
    d2 = F.aggregate(F.col("z"), F.lit(0.0), lambda a, s: a + s * s)
    scored = z.select("vec_id", d2.alias("maha2"))
    bar = DIM + 4 * (2 * DIM) ** 0.5  # mean + 4σ of χ²(dim)
    out = scored.filter(F.col("maha2") > bar)
    print(f"Mahalanobis screen: {out.count()} vectors over the "
          f"χ²({DIM}) mean+4σ bar ({bar:.0f})")
    out.orderBy(F.desc("maha2")).show(3)

    # 3. plan the mixture: waterfill the token budget over sources —
    #    small sources saturate, their unused share redistributes
    from go_streaming_spark.functions.sampling import mixture_waterfill_plan

    srcs = [r[0] for r in docs.select("source").distinct().collect()]
    weights = {s: 3 if int(s[3:]) % 5 == 0 else 1 for s in srcs}
    plan = mixture_waterfill_plan(docs, "source", "n_chars",
                                  budget=100_000, weights=weights)
    sat = plan.filter("saturated = 1").count()
    print(f"mixture plan: {sat} sources saturated; allocation:")
    plan.orderBy(F.desc("used_tokens")).show(4)

    # 4. the deterministic training layout: seeded md5 shuffle key →
    #    range-sharded sorted write; the manifest proves no shard was
    #    dropped and key ranges are disjoint
    keyed = docs.select(
        "doc_id", "text",
        F.md5(F.concat_ws("|", F.lit("epoch1"),
                          F.col("doc_id").cast("string"))).alias("skey"),
    )
    root = tempfile.mkdtemp(prefix="train_layout_")
    try:
        manifest = write_training_shards(
            keyed, f"{root}/shards", "skey", target_bytes=32 << 10,
            mode="overwrite",
        ).collect()
        total_rows = sum(r["n_rows"] for r in manifest)
        ordered = sorted(manifest, key=lambda r: r["min_key"])
        assert total_rows == keyed.count()
        assert all(a["max_key"] < b["min_key"]
                   for a, b in zip(ordered, ordered[1:]))
        print(f"wrote {len(manifest)} shards, {total_rows} rows, "
              "disjoint sorted key ranges — a trainer streams shard "
              "0..N-1 and reads the epoch-1 global shuffle order")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
