"""Batch + streaming readers for the driver-provided parquet tables.

The driver generates TPC-H-ish tables plus ``events``, ``documents`` and
``embeddings`` (see TESTDATA.md).  Timestamps in those files are parquet
TIMESTAMP(NANOS), which Spark's reader rejects; with
``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as int64 nanos and
are converted here with integer arithmetic (``ts div 1000`` — floor division
keeps exact microseconds; a double division would lose precision at 1.7e18).
DuckDB truncates nanos→micros on read the same way, so oracle comparisons line
up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_streaming_spark.session import configure_session

# Columns stored as TIMESTAMP(NANOS) in the driver parquet, per table.
_NANOS_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table as a batch DataFrame with proper timestamp types."""
    configure_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _fix_timestamps(df, name)


def _fix_timestamps(df: DataFrame, name: str) -> DataFrame:
    for col in _NANOS_TS_COLS.get(name, []):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    return df


def load_stream(
    spark: SparkSession, sf_dir: str, name: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Read one driver table as a *streaming* DataFrame (file source).

    Reference streams are in-memory topics (`pkg/pubsub/pub_sub.go:370-384`);
    here a parquet directory plays the topic, replayed with
    ``Trigger.AvailableNow`` for finite tests.  ``max_files_per_trigger``
    maps the reference's bounded-buffer backpressure
    (`pkg/events/buffer.go:515-561`) onto source rate limiting.
    """
    configure_session(spark)
    schema = spark.read.parquet(f"{sf_dir}/{name}.parquet").schema
    # the file stream source wants a directory; glob-filter to this table
    reader = spark.readStream.schema(schema).option(
        "pathGlobFilter", f"{name}.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    return _fix_timestamps(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views (SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
