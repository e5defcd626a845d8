"""Round-8 showcase: the retrieval / tokenizer-prep stack over the
driver's ``documents`` and ``embeddings`` tables —

    inverted index -> batch BM25 top-k retrieval
    -> JL projection -> projected-ANN with exact rescore
    -> cross-split embedding leakage audit
    -> TextRank keywords -> BPE merge rules -> LM fluency gate

every stage a composable DataFrame transform; physical strategies in
SCALE.md (map-side doc lengths, broadcast query vocab, BLAS-blocked
audit, integer-exact PageRank).

Run: python examples/retrieval_stack.py [sf_dir]  (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.functions import dedup, similarity, text
from go_streaming_spark.functions.sampling import hash_split
from go_streaming_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-retrieval-stack", cores=8)
    engine = Engine(spark, sf_dir=sf_dir)
    docs = engine.stream("documents")
    emb = engine.stream("embeddings")

    # 1. inverted index: what a retrieval stack persists
    idx = text.inverted_index(docs, "doc_id", "text", min_df=2)
    print(f"index terms: {idx.count()}")

    # 2. batch BM25: top-3 docs for each of two queries, one plan
    qdf = spark.createDataFrame(
        [(1, "hash"), (1, "join"), (2, "vector")], "query_id long, term string"
    )
    hits = text.bm25_topk(docs, "doc_id", "text", qdf, k=3)
    hits.show(6, truncate=False)

    # 3. dimension-reduced ANN: JL candidates, exact rescore
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    ann = similarity.jl_topk(
        emb.filter(F.col("vec_id") != 0), "vec_id", "embedding", qv,
        k=5, candidates=25, out_dim=16, dim=64,
    )
    ann.show()

    # 4. leakage audit: near-dup pairs straddling a 90/10 split
    split = hash_split(emb, "vec_id", {"train": 0.9, "test": 0.1}, seed="split")
    leaks = dedup.embedding_cosine_cross_pairs_blocked(
        split.filter(F.col("split") == "train"),
        split.filter(F.col("split") == "test"),
        "vec_id", "embedding", 0.35,
    )
    print(f"cross-split near-dup pairs (cos >= 0.35): {leaks.count()}")

    # 5. corpus keywords by TextRank (integer-exact PageRank)
    text.textrank_terms(docs, "doc_id", "text", top_n=5).show()

    # 6. first BPE merges (canonical greedy, word-count formulation)
    text.bpe_learn_merges(docs, "doc_id", "text", n_merges=5).show()

    # 7. LM fluency gate: lowest-scoring documents are the garbage tail
    text.lm_bigram_quality(docs, "doc_id", "text").orderBy("avg_cond_q").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
