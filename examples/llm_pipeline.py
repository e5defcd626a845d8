"""Beyond-reference showcase: an end-to-end training-corpus curation
pipeline over the driver's ``documents`` and ``embeddings`` tables —

    quality gate -> test-set decontamination -> PII redaction
    -> exact dedup -> near-dup clustering (MinHash+LSH + connected
    components, keep canonical) -> stratified sampling -> train/val/test
    split -> token-budget sequence packing -> similarity search sanity probe

every stage a composable DataFrame transform (no driver-side data paths,
each stage's physical plan documented in SCALE.md).

Run: python examples/llm_pipeline.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.functions import dedup, similarity, text
from go_streaming_spark.functions.graph import dedup_components
from go_streaming_spark.functions.sampling import hash_split, stratified_sample
from go_streaming_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session("example-llm-pipeline", cores=8)
    engine = Engine(spark, sf_dir=sf_dir)
    docs = engine.stream("documents")
    n0 = docs.count()

    # 1. quality gate: enough words, mostly-alpha content
    quality = text.quality_score(docs, "doc_id", "text")
    keep = quality.filter((F.col("n_words") >= 5) & (F.col("alpha_ratio") > 0.5))
    docs = docs.join(keep.select(F.col("id").alias("doc_id")), "doc_id", "left_semi")
    print(f"quality gate:        {n0} -> {docs.count()} docs")

    # 2. decontamination: drop docs containing benchmark n-grams
    banned = spark.createDataFrame(
        [("stream table hash",), ("row column sort",)], "ngram string"
    )
    docs = text.decontaminate(docs, "doc_id", "text", banned, n=3)
    print(f"decontamination:     -> {docs.count()} docs")

    # 3. PII redaction (map-side regexp chain, no UDF)
    docs = docs.withColumn("text", text.redact(F.col("text")))

    # 4. exact dedup on the CANONICAL text form (casing / punctuation /
    #    spacing variants collapse): keep the lowest doc_id per form
    canon = docs.withColumn("_norm", text.normalize_for_dedup(F.col("text")))
    groups = dedup.exact_dedup(canon, "doc_id", ["_norm"])
    docs = docs.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    print(f"normalized dedup:    -> {docs.count()} docs")

    # 5. near-dup clustering: MinHash+LSH pairs -> connected components ->
    #    keep only each cluster's canonical (minimum) member
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.4)
    clusters = dedup_components(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    docs = docs.join(drop, "doc_id", "left_anti")
    print(f"near-dup clustering: -> {docs.count()} docs")

    # 6. stratified rebalancing + deterministic train/val/test split
    docs = stratified_sample(
        docs, "doc_id", "source", {"src0": 1.0, "src1": 1.0}, default=0.8
    )
    final = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    print("final corpus by split:")
    for row in final.groupBy("split").count().orderBy("split").collect():
        print(f"  {row['split']:<6} {row['count']}")

    # 7. pack the train split into fixed-token-budget training sequences
    #    (bucketed cumsum window — one shuffle, no global sort)
    train = final.filter(F.col("split") == "train")
    packed = text.pack_sequences(train, "doc_id", "text", budget=256, n_buckets=8)
    n_seqs = packed.select("bucket", "seq_id").distinct().count()
    print(f"sequence packing:    {train.count()} docs -> {n_seqs} sequences of <=256 tokens")

    # 8. incremental ingestion: a "new crawl" arrives (here: a re-crawl of
    #    every 10th doc plus noise) — dedup the DELTA against the curated
    #    corpus without re-deduping the corpus: exact digests first, then
    #    near-dup via the corpus band index
    recrawl = engine.stream("documents").filter(F.col("doc_id") % 10 == 0)
    batch = recrawl.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    nb = batch.count()
    fresh = dedup.incremental_exact_dedup(batch, docs, "doc_id", ["text"])
    survivors = batch.join(
        fresh.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi"
    )
    #    production shape: the corpus band/shingle index is built ONCE per
    #    snapshot (persistable via idx.save/load), cached by the caller,
    #    and every batch joins it; _full also resolves in-batch near-dups
    idx = dedup.build_minhash_index(docs, "doc_id", "text").cache()
    survivors = dedup.incremental_minhash_dedup_full(
        survivors, None, "doc_id", "text", threshold=0.4, index=idx
    )
    print(f"incremental ingest:  {nb} new docs -> {survivors.count()} truly novel")
    idx.unpersist()
    #    ...or the same pipeline through the unified snapshot object:
    #    build once, persist, ingest every crawl (exact + near-dup +
    #    span report in one call, state appended with the survivors)
    from go_streaming_spark.functions.corpus_state import CorpusState

    state = CorpusState.build(docs, "doc_id", "text")
    clean, state = state.ingest(batch, "doc_id", "text", threshold=0.4)
    n_flagged = clean.filter(F.col("dup_span_tokens") > 0).count()
    print(f"CorpusState ingest:  {clean.count()} survivors, {n_flagged} with corpus-known spans")

    # 9. multimodal: wrap text bytes in real container headers and decode
    #    them back with the pure-byte parser (PNG/JPEG/WAV round-trip)
    from go_streaming_spark.functions import multimodal

    media = multimodal.synthesize_payloads(docs.limit(30), "doc_id", "text")
    meta = multimodal.decode_media_meta(media, "doc_id")
    print("decoded media formats:")
    for row in meta.groupBy("format").count().orderBy("format").collect():
        print(f"  {row['format']:<5} x{row['count']}")
    #     ...and REAL content decode for uncompressed containers: BMP pixel
    #     bytes / WAV PCM samples read back through the container geometry
    raw = multimodal.synthesize_payloads_raw(docs.limit(30), "doc_id", "text")
    cstats = multimodal.content_stats(raw, "doc_id")
    #     ...and the COMPRESSED tiers decode for real too: PNG (stdlib
    #     inflate + defilter) and GIF (pure-Python LZW)
    png = multimodal.synthesize_payloads_png(docs.limit(15), "doc_id", "text")
    gif = multimodal.synthesize_payloads_gif(docs.limit(15), "doc_id", "text")
    jpg = multimodal.synthesize_payloads_jpeg(docs.limit(15), "doc_id", "text")
    cstats = (
        cstats.unionByName(multimodal.content_stats(png, "id"))
        .unionByName(multimodal.content_stats(gif, "id"))
        .unionByName(multimodal.content_stats(jpg, "id"))
    )
    print("content stats (mean unit value per format):")
    for row in (
        cstats.groupBy("format").agg(F.avg("mean_val").alias("m"))
        .orderBy("format").collect()
    ):
        print(f"  {row['format']:<5} mean={row['m']:.2f}")

    # 10. similarity-search sanity probe on the embedding table — exact
    #     float scoring and the int8-quantized 4×-less-shuffle twin
    emb = engine.stream("embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    corpus_emb = emb.filter(F.col("vec_id") != 0)
    topk = similarity.cosine_topk(corpus_emb, "vec_id", "embedding", qv, 5)
    qtopk = similarity.quantized_cosine_topk(corpus_emb, "vec_id", "embedding", qv, 5)
    print("nearest neighbors of vec 0 (exact | int8-quantized):")
    for row, qrow in zip(topk.collect(), qtopk.collect()):
        print(f"  vec {row['id']} cos={row['cos_sim']:.4f}  |"
              f"  vec {qrow['id']} qcos={qrow['cos_sim']:.4f}")

    # 11. substring-span dedup with the keep-one policy (on the RAW table —
    #     doc-level dedup upstream already stripped the whole-doc copies
    #     this op exists to catch inside partial overlaps)
    raw_docs = engine.stream("documents")
    spans = dedup.duplicated_spans(raw_docs, "doc_id", "text", k=8, keep_first=True)
    n_spans = spans.count()
    cleaned = dedup.remove_spans(raw_docs, spans, "doc_id", "text")
    shrink = (
        raw_docs.agg(F.sum(F.length("text"))).head()[0]
        - cleaned.agg(F.sum(F.length("text"))).head()[0]
    )
    print(f"span dedup (raw corpus): {n_spans} removable spans, {shrink} chars cut")

    # 12. quality gate + contamination report + temperature mixing — the
    #     doc-level curation trio (contamination measured raw: the cleaned
    #     corpus is decontaminated by construction, and the report proves it)
    from go_streaming_spark.functions import sampling, text as tx

    flags = tx.gopher_quality_flags(docs, "doc_id", "text")
    kept = flags.filter(F.col("keep") == 1).count()
    print(f"quality gate: kept {kept}/{flags.count()}")
    train = raw_docs.filter(F.col("doc_id") % 10 == 0)
    eval_raw = raw_docs.filter(F.col("doc_id") % 10 != 0)
    cont = tx.contamination_stats(eval_raw, train, "doc_id", "text", k=8)
    dirty = cont.filter(F.col("hit_rate") > 0).count()
    clean_cont = tx.contamination_stats(
        docs.filter(F.col("doc_id") % 10 != 0), train, "doc_id", "text", k=8
    ).filter(F.col("hit_rate") > 0).count()
    print(f"contamination: raw {dirty} overlapping eval docs -> cleaned {clean_cont}")
    wts = sampling.temperature_weights(docs, "source", alpha=0.5)
    mixed = sampling.mixture_copy_counts_df(docs, "doc_id", "source", wts)
    total_copies = mixed.agg(F.sum("n_copies")).head()[0]
    print(f"temperature mix (a=0.5): {total_copies} copies from {docs.count()} docs")

    # 13. sketch-based corpus statistics: count-min heavy hitters (the
    #     exact answer, found through the sound CMS prefilter) and the
    #     join-key skew report that drives salting decisions
    from go_streaming_spark.functions import sketch
    from go_streaming_spark.operators.skew import key_skew_stats

    words = raw_docs.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda w: w != "")).alias("word")
    )
    hot = sketch.heavy_hitters(words, "word", min_count=500, width=256)
    print(f"heavy hitters (>=500 occurrences): {hot.count()} words")
    ev = engine.stream("events")
    print("hottest join keys on events.event_type:")
    for row in key_skew_stats(ev, "event_type", top=3).collect():
        print(f"  {row['key']:<10} {row['n_rows']:>6} rows  share={row['share']:.3f}")

    # 14. round-7 sketches: Bloom-prefiltered incremental dedup (the
    #     definitely-new mass never shuffles against the corpus) and the
    #     mergeable HyperLogLog cardinality state
    corpus7 = docs.filter(F.col("doc_id") % 10 == 0)
    batch7 = docs.filter(F.col("doc_id") % 10 != 0)
    surv = dedup.incremental_exact_dedup_bloom(
        batch7, corpus7, "doc_id", ["text"]
    ).count()
    print(f"bloom-prefiltered ingest: {surv} new digests")
    hll = sketch.hll_grouped(ev, "event_type", "user_id", p=12)
    for row in hll.collect():
        print(f"  ~{row['est']:.0f} distinct users for {row['event_type']}")
    engine.close()
    spark.stop()


if __name__ == "__main__":
    main()
