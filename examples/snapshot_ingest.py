"""Round-12 showcase: the durable recurring-crawl loop at production
layout —

    CorpusState.build(seed corpus)
      -> save_bucketed()            # catalog tables, bucketed on every
                                    # ingest join key: the one-time
                                    # shuffle that de-shuffles every
                                    # future batch
      -> load_bucketed()            # fresh session / next pipeline run
      -> ingest(batch 1) -> ingest(batch 2)   # only batch-sized data
                                              # moves; corpus state is
                                              # read in place
      -> survivors delivered through subscribe_batch(ordered_by=...,
         global_order=True)         # the bulk sorted sink: pandas
                                    # chunks in global key order, no
                                    # per-row driver callback

Reference parity: the reference's subscriber sees events in stream
order from an in-memory topic (`pkg/pubsub/stream.go:297-319` sorted
delivery); here the "topic" is the crawl, the accumulated corpus state
is the durable twin of its per-topic buffers
(`pkg/events/buffer.go`), and the sorted bulk sink is the 100 TB-shaped
delivery path.

Run: python examples/snapshot_ingest.py [sf_dir]
     (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.functions.corpus_state import CorpusState
from go_streaming_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("snapshot_ingest_example", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, sf_dir=sf_dir)
    docs = eng.stream("documents").select("doc_id", "text")

    # seed corpus = even ids; two crawl batches = odd ids split in half
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 1))
    b2 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 4 == 3))

    print("== build + save_bucketed (the snapshot artifact) ==")
    state = CorpusState.build(corpus, "doc_id", "text")
    state.save_bucketed("snap", n_buckets=8)

    print("== load_bucketed (next run) + two ingests ==")
    st = CorpusState.load_bucketed(spark, "snap")
    clean1, st = st.ingest(b1, "doc_id", "text", threshold=0.5)
    n1 = clean1.count()
    clean2, st = st.ingest(b2, "doc_id", "text", threshold=0.5)
    survivors = clean1.select("doc_id", "dup_span_tokens").unionByName(
        clean2.select("doc_id", "dup_span_tokens")
    )
    print(f"batch1 survivors: {n1}; batch2 survivors: {clean2.count()}")

    print("== bulk sorted delivery of the survivor manifest ==")
    chunks: list[int] = []

    def sink(pdf) -> None:
        chunks.append(len(pdf))
        head = ", ".join(str(x) for x in pdf["doc_id"].head(5))
        print(f"  chunk of {len(pdf)} (doc_id {head}, ...)")

    cq = eng.builder().from_df(survivors).build()
    cq.subscribe_batch(sink, ordered_by=["doc_id"], global_order=True,
                       chunk_rows=256)
    cq.await_done()
    print(f"delivered {sum(chunks)} survivors in {len(chunks)} ordered chunks")

    # tidy the demo catalog tables
    for t in ("digests", "grams", "cms", "params",
              "minhash_bands", "minhash_shingles", "minhash_params"):
        spark.sql(f"DROP TABLE IF EXISTS snap_{t}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
