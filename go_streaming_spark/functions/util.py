"""Shared helpers for the function library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster parallelism)
    partitions before a compute-heavy per-row stage.

    A small parquet file arrives as one input split, which serializes any
    expensive downstream expression (shingling, hashing, regex sweeps) onto
    one core no matter how large the cluster.  The round-robin shuffle of the
    *narrow* input rows is far cheaper than running the exploded/hashed
    stage single-threaded.  Inputs that already have enough splits (the
    100 TB case) pass through untouched — no extra shuffle.
    """
    if df.isStreaming:
        # micro-batch partitioning is the source's concern; .rdd is
        # unsupported on streaming frames
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
