"""Storage layout for co-located (shuffle-free) joins and aggregations.

At 100 TB the dominant cost of a repeatedly-joined fact table is
re-shuffling it on the join key for every query.  Bucketing pays that
shuffle ONCE at write time: both sides of a join bucketed into the same
number of buckets on the key join bucket-to-bucket with NO exchange in
the plan, and per-bucket sorting removes the sort too (pure merge-join).
The same layout serves groupBy(key) without a shuffle.

This is Spark's answer to the reference's keyed in-memory stream storage
(`/root/reference/pkg/pubsub/stream.go` keeps one buffer per typed
stream): declare the partitioning once, in the table, instead of in
every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
    fmt: str = "parquet",
) -> DataFrame:
    """Persist ``df`` as a bucketed (and per-bucket sorted) managed table;
    returns the re-read table.  Joins/groupBys on ``key`` between tables
    written with the SAME ``n_buckets`` plan without an Exchange —
    verified by ``tests/test_layout.py`` on the physical plan text.

    Sizing: pick ``n_buckets`` so each bucket is a few hundred MB at the
    target scale (buckets are the parallelism floor for downstream reads);
    powers of two let two layouts coexist (a 512-bucket table co-locates
    with a 1024-bucket one only after a rewrite, so standardize early).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    writer = (
        df.write.mode("overwrite").format(fmt).bucketBy(n_buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table written by :func:`write_bucketed`."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
