"""Generic source/sink format support beyond the driver parquet catalog.

The reference's only transport is the in-memory topic
(`pkg/pubsub/pub_sub.go:370-384`); a Spark engine's topics are storage- or
broker-backed.  This module gives the engine uniform batch + streaming
readers and a sink writer over the formats the local runtime supports
(parquet / json / csv / orc, plus the `rate` synthetic stream).  A Kafka
topic would slot in the same way (`format("kafka")`) but needs the broker
package at runtime, so it is surfaced but not imported eagerly.

Scale notes: readers accept explicit schemas (inference is a full extra
pass at 100 TB — always pass one in production); sinks default to snappy
parquet with optional partitioning columns (partition pruning on read is
free for downstream queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from go_streaming_spark.session import configure_session

BATCH_FORMATS = ("parquet", "json", "csv", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Batch read of a storage-backed topic."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format {fmt!r}; use one of {BATCH_FORMATS}")
    configure_session(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        # schema inference is an extra full scan — fine for tests, wrong at
        # scale; callers get it only when they didn't pass a schema
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def read_source_stream(
    spark: SparkSession,
    path_or_fmt: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Streaming read: a file-backed topic (parquet/json/csv directory) or
    the synthetic ``rate`` source (``read_source_stream(spark, "rate",
    rowsPerSecond=...)``).  File streams need an explicit schema — streaming
    cannot infer."""
    configure_session(spark)
    if path_or_fmt == "rate":
        return spark.readStream.format("rate").options(**options).load()
    if schema is None:
        raise ValueError("streaming file sources require an explicit schema")
    reader = spark.readStream.format(fmt).schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path_or_fmt)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Batch write; ``partition_by`` lays out hive-style partitions so
    downstream reads get partition pruning."""
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed catalog table: rows hash-partitioned into ``n_buckets``
    files by ``bucket_cols`` at write time.

    THE shuffle-avoidance tool for repeated fact-fact joins at 100 TB: two
    tables bucketed (and sorted) on the same key with the same bucket count
    sort-merge-join with **no Exchange on either side** — the join cost is
    paid once at write, then every downstream join/aggregation on the
    bucket key is shuffle-free (asserted in
    test_plans.py::test_bucketed_join_no_exchange).  Catalog-backed
    (``saveAsTable``): bucket metadata lives in the table definition;
    ``path`` makes it an EXTERNAL table at that location (the data
    outlives ``DROP TABLE`` — the snapshot-artifact shape), but reads
    must still go through ``spark.table(name)``: a path read loses the
    bucket spec and with it the no-exchange plan.
    """
    writer = (
        df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read raw files as rows via Spark's `binaryFile` source — the
    ingestion front door for the multimodal tier: each file becomes
    (path, modificationTime, length, content binary), which
    `functions.multimodal.attach_media` / `decode_media_meta` consume
    directly (the reference's event-content spirit applied to media
    payloads on disk).

    `glob` filters by filename pattern (pushed into the file listing, not
    a post-scan filter); `max_bytes` guards against whale files blowing
    executor memory — at 100 TB a single unexpectedly-huge object in a
    crawl bucket is a certainty, and the filter happens on the LENGTH
    metadata column, so oversize payload bytes are never materialized
    (the source reads content lazily per row batch).  Text formats go
    through `read_source`; this is for media/opaque payloads only.
    """
    configure_session(spark)
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(df["length"] <= max_bytes)
    return df


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
    range_cols: list[str] | None = None,
    mode: str = "error",
) -> int:
    """Rewrite a directory of many small files into ~``target_bytes``
    files; returns the output file count chosen.

    The small-file problem is the silent killer of long-lived 100 TB
    tables: every micro-batch / hourly job appends a handful of tiny
    files, and a year later the NameNode strains under millions of
    objects while every scan pays per-file open cost and loses
    whole-stage locality.  Compaction = read → repartition to
    ceil(input_bytes / target) → rewrite once.

    ``range_cols`` switches the redistribution to ``repartitionByRange``,
    preserving (re-establishing) a sorted clustering so min/max file
    statistics stay selective — pair with ``operators.layout.zorder_layout``
    for multi-column locality.  Input size comes from the filesystem via
    Hadoop's ``ContentSummary`` (works on HDFS/S3A/local alike); output
    size per file lands near ``target_bytes`` times the format's
    compression ratio, which is the standard operating point (Delta/
    Iceberg OPTIMIZE use the same uncompressed-input heuristic).
    """
    configure_session(spark)
    jvm = spark._jvm
    jsc = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(jsc)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, -(-int(total) // int(target_bytes)))
    df = spark.read.format(fmt).load(path)
    out = (
        df.repartitionByRange(n_files, *range_cols)
        if range_cols
        else df.repartition(n_files)
    )
    out.write.format(fmt).mode(mode).save(out_path)
    return n_files


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
    mode: str = "error",
) -> "DataFrame":
    """Write the final training layout: ~``target_bytes`` shards,
    range-partitioned and sorted by ``order_col`` (the deterministic
    shuffle key from ``sampling.corpus_shuffle``), so a trainer streaming
    shard 0..N-1 in filename order reads the corpus in the intended
    global order without any reader-side sort.

    Returns the shard manifest as a DataFrame — (shard, n_rows,
    min_key, max_key) per output file, derived from a post-write scan
    with the filename virtual column — which the training job checks in
    (row totals match, key ranges are disjoint and sorted ⇒ no shard
    was dropped or duplicated).  Estimation note: shard count sizes from
    the SOURCE directory when ``df`` is a plain scan; for derived frames
    pass an explicit ``target_bytes``-per-row-derived count via
    ``df.repartitionByRange`` upstream instead.

    One range shuffle (sampled boundaries) + sortWithinPartitions —
    the same cost any global-order write pays; no driver-side data.
    """
    spark = df.sparkSession
    configure_session(spark)
    est_rows = df.count()
    # bytes-per-row from a bounded sample written nowhere: use Spark's
    # logical size stats when available, else assume 1 KiB/row (docs) —
    # the knob that matters is target_bytes; callers tune one number.
    try:
        logical = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        bpr = max(64, int(logical) // max(1, est_rows))
    except Exception:
        bpr = 1024
    n_shards = max(1, -(-(est_rows * bpr) // int(target_bytes)))
    (
        df.repartitionByRange(n_shards, order_col)
        .sortWithinPartitions(order_col)
        .write.format(fmt)
        .mode(mode)
        .save(path)
    )
    from pyspark.sql import functions as _F

    out = spark.read.format(fmt).load(path)
    return (
        out.withColumn("shard", _F.element_at(_F.split(_F.input_file_name(), "/"), -1))
        .groupBy("shard")
        .agg(
            _F.count(_F.lit(1)).alias("n_rows"),
            _F.min(order_col).alias("min_key"),
            _F.max(order_col).alias("max_key"),
        )
        .orderBy("shard")
    )
