"""Shared helpers for the function library."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# SQL template of the cross-engine 6-dec quantizer (format with the
# expression string); keep in sync with :func:`q6`.
Q6_SQL = "floor(({})*1e6 + 0.5)/1e6"


def q6(c: Column) -> Column:
    """Quantize a double to 6 decimals with ``floor(x*1e6 + 0.5)/1e6`` —
    the repo's cross-engine rounding idiom.  ``round(double, 6)`` diverges
    between Spark and DuckDB on representation ties (half-away vs
    round-half-even banker's behavior interacting with the binary
    representation of x*10^6); this form is the SAME two double ops in
    both engines, so results agree bit-for-bit whenever the input double
    does.  Use it (with the matching ``Q6_SQL`` template in the oracle)
    for every oracle-compared rounded-double output column."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


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
