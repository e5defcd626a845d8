#!/usr/bin/env python
"""Round-13 scale sweeps for the four round-12 registrations — one probe
per process (see scale_sweep.py's docstring: back-to-back sf≈1 heavies in
one JVM cross-inflate via GC pressure).

    python tools/r13_shapes_sweep.py ivf     # snapshot write vs probe-only
    python tools/r13_shapes_sweep.py gram    # one-pass gram statistic
    python tools/r13_shapes_sweep.py dense   # streaming dense window grid
    python tools/r13_shapes_sweep.py bulk    # bulk-order merge-buffer peak

Each prints one JSON line per scale.  Requires /tmp/scale_sf1 (built by
``python tools/scale_sweep.py --build``).  Timings are min-of-N end-to-end
in a quiet window; the sf0.1 pass doubles as JIT warm-up.
"""

from __future__ import annotations

import json
import os
import sys
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


def ivf() -> None:
    """ann_ivf_pruned_topk decomposed: the per-SNAPSHOT index write vs
    the per-QUERY probe.  The claim under test: probe wall time is FLAT
    as the corpus grows (the scan reads only the nprobe pruned
    partitions), while the write grows with the corpus — so at
    production cadence (write once, probe many) query cost is
    independent of corpus size."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity

    spark = _session("r13-ivf")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
        corpus = emb.filter(F.col("vec_id") != 0)
        cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
        tmp = tempfile.mkdtemp(prefix="r13_ivf_")
        try:
            t0 = time.time()
            similarity.save_ivf_index(
                corpus, "vec_id", "embedding", "label", cent, tmp
            )
            write_s = round(time.time() - t0, 3)

            def probe():
                similarity.ivf_pruned_topk(
                    spark, tmp, "vec_id", "embedding", "label", qv,
                    k=10, nprobe=2,
                ).collect()

            probe_s = _min_of(5, probe)
            n = corpus.count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(json.dumps({
            "probe": "ivf", "sf": sf, "corpus_rows": n,
            "index_write_sec": write_s, "probe_min5_sec": probe_s,
        }), flush=True)


def gram() -> None:
    """quality_probe_gram: one map-side-combined scan, fixed 45-cell
    state.  The claim: wall time ~linear in corpus (map CPU only — the
    aggregation state never grows)."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_llm  # noqa: F401

    spark = _session("r13-gram")
    for sf, sf_dir in SCALES:
        fn = QUERIES["quality_probe_gram"]
        sec = _min_of(3, lambda: fn(spark, sf_dir).collect())
        print(json.dumps({"probe": "gram", "sf": sf, "min3_sec": sec,
                          "cells": 45}), flush=True)


def dense() -> None:
    """stream_window_count_dense: the densified grid covers exactly the
    FIRED window range.  The claim: grid size is span/shift-sized (the
    event TIME range, unchanged by the 10× key-offset replication), so
    output rows stay ~flat while input rows grow 10×."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_ext  # noqa: F401
    import go_streaming_spark.queries_llm  # noqa: F401

    spark = _session("r13-dense")
    for sf, sf_dir in SCALES:
        fn = QUERIES["stream_window_count_dense"]
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        sec = round(time.time() - t0, 3)
        print(json.dumps({"probe": "dense", "sf": sf, "sec": sec,
                          "grid_rows": len(rows)}), flush=True)


def bulk() -> None:
    """subscribe_batch(ordered_by, global_order, max_out_of_order):
    driver merge-buffer PEAK vs the disorder bound.  The claim: with a
    watermark the peak is ∝ max_out_of_order + one micro-batch and FLAT
    as the stream grows 10×; exact mode (no watermark) buffers the whole
    stream — measured via ContinuousQuery.buffer_peak_rows.

    Input: per-scale event keys re-sequenced to 0..n-1, scattered into
    key-block files with deterministic ±D jitter (disorder bounded by
    D), replayed one file per trigger with pinned ascending mtimes.
    """
    import hashlib
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_streaming_spark.engine import Engine

    B = 50_000        # rows per micro-batch file
    D = 1_000         # disorder bound (keys can arrive up to D early/late)

    spark = _session("r13-bulk")
    for sf, sf_dir in SCALES:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n = ev.count()
        seq = np.arange(n, dtype=np.int64)
        rng = np.random.default_rng(
            int(hashlib.md5(f"r13bulk{sf}".encode()).hexdigest()[:8], 16)
        )
        jitter = rng.integers(-D, D + 1, size=n)
        fidx = np.clip((seq + jitter) // B, 0, (n - 1) // B)
        tmp = tempfile.mkdtemp(prefix="r13_bulk_")
        try:
            for k in range(int(fidx.max()) + 1):
                part = seq[fidx == k]
                pq.write_table(
                    pa.table({"seq": pd.Series(part, dtype="int64")}),
                    f"{tmp}/part-{k:05d}.parquet",
                )
                t = 1_700_000_000 + k * 10
                os.utime(f"{tmp}/part-{k:05d}.parquet", (t, t))
            results = {}
            # correct watermark for ±D key jitter is 2D: max_seen can
            # run D ahead (early arrivals) while a straggler runs D
            # late; d=0 shows best-effort violations for contrast
            for d in (0, 2 * D, None):
                if d is None and sf >= 1.0:
                    continue  # exact mode at 10× would buffer 1M rows; skip
                eng = Engine(spark)
                stream = (
                    spark.readStream.schema("seq long")
                    .option("maxFilesPerTrigger", 1)
                    .parquet(tmp)
                )
                cq = eng.builder().from_df(stream).build()
                delivered = {"n": 0, "last": -1, "ooo": 0}

                def sink(pdf):
                    s = pdf["seq"].tolist()
                    delivered["n"] += len(s)
                    for x in s:
                        if x < delivered["last"]:
                            delivered["ooo"] += 1
                        delivered["last"] = max(delivered["last"], x)

                t0 = time.time()
                cq.subscribe_batch(
                    sink, ordered_by=["seq"], global_order=True,
                    max_out_of_order=d,
                )
                cq.await_done()
                sec = round(time.time() - t0, 3)
                results[f"d={d}"] = {
                    "peak_buffer_rows": cq.buffer_peak_rows,
                    "delivered": delivered["n"],
                    "order_violations": delivered["ooo"],
                    "sec": sec,
                }
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(json.dumps({"probe": "bulk", "sf": sf, "rows": n,
                          "batch_rows": B, "disorder": D,
                          "modes": results}), flush=True)




def gram_sparse() -> None:
    """quality_probe_gram_sparse: explode + one map-side-combined
    groupBy.  The claim: ~linear map CPU, fixed output (45 cells)."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_ext  # noqa: F401
    import go_streaming_spark.queries_llm  # noqa: F401

    spark = _session("r13-gram-sparse")
    for sf, sf_dir in SCALES:
        fn = QUERIES["quality_probe_gram_sparse"]
        sec = _min_of(3, lambda: fn(spark, sf_dir).collect())
        print(json.dumps({"probe": "gram_sparse", "sf": sf,
                          "min3_sec": sec}), flush=True)


def rebuild() -> None:
    """rebuild_ivf_index: k-means passes + one full rewrite — the
    per-snapshot price.  The claim: ~linear in corpus (bounded k×(dim+1)
    driver state per Lloyd round), and the post-rebuild PROBE stays flat
    (pruning restored regardless of corpus size)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from go_streaming_spark.functions import similarity

    spark = _session("r13-rebuild")
    for sf, sf_dir in SCALES:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        qv = [float(x) for x in
              emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
        corpus = emb.filter(F.col("vec_id") != 0)
        cent = similarity.label_centroids(corpus, "label", "embedding", dim=64)
        tmp = tempfile.mkdtemp(prefix="r13_rebuild_")
        try:
            similarity.save_ivf_index(
                corpus, "vec_id", "embedding", "label", cent, f"{tmp}/a"
            )
            t0 = time.time()
            similarity.rebuild_ivf_index(
                spark, f"{tmp}/a", f"{tmp}/b", "vec_id", "embedding",
                "label", k=10, iters=3,
            )
            rebuild_s = round(time.time() - t0, 3)

            def probe():
                similarity.ivf_pruned_topk(
                    spark, f"{tmp}/b", "vec_id", "embedding", "label", qv,
                    k=10, nprobe=2,
                ).collect()

            probe_s = _min_of(5, probe)
            n = corpus.count()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        print(json.dumps({"probe": "rebuild", "sf": sf, "corpus_rows": n,
                          "rebuild_sec": rebuild_s,
                          "probe_min5_sec": probe_s}), flush=True)


def ingest2() -> None:
    """corpus_ingest_two_batch_survivors: the sequential ingest loop.
    The claim: per-batch cost tracks BATCH size (corpus-side state reads
    stay index-shaped), so the two-batch composition scales ~linearly in
    data like the one-shot ingest."""
    from go_streaming_spark.queries import QUERIES
    import go_streaming_spark.queries_ext  # noqa: F401
    import go_streaming_spark.queries_llm  # noqa: F401

    spark = _session("r13-ingest2")
    for sf, sf_dir in SCALES:
        fn = QUERIES["corpus_ingest_two_batch_survivors"]
        t0 = time.time()
        n = len(fn(spark, sf_dir).collect())
        sec = round(time.time() - t0, 3)
        print(json.dumps({"probe": "ingest2", "sf": sf, "sec": sec,
                          "survivors": n}), flush=True)


if __name__ == "__main__":
    {"ivf": ivf, "gram": gram, "dense": dense, "bulk": bulk,
     "gram_sparse": gram_sparse, "rebuild": rebuild, "ingest2": ingest2}[sys.argv[1]]()
