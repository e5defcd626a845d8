"""Batch + streaming readers for the driver-provided parquet tables.

The driver generates TPC-H-ish tables plus ``events``, ``documents`` and
``embeddings`` (see TESTDATA.md).  Timestamp columns have shipped in two
encodings across driver versions, both normalized here to Spark TIMESTAMP:

* parquet TIMESTAMP(NANOS) — read as int64 nanos under
  ``spark.sql.legacy.parquet.nanosAsLong=true`` and converted with integer
  arithmetic (``ts div 1000`` — floor division keeps exact microseconds;
  DuckDB truncates nanos→micros on read the same way).
* parquet timestamp[us] without timezone — read as TIMESTAMP_NTZ and cast to
  TIMESTAMP, value-exact under the session's UTC zone.
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
        if col not in df.columns:
            continue
        dtype = df.schema[col].dataType
        if isinstance(dtype, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif isinstance(dtype, T.TimestampNTZType):
            # Newer driver data stores timestamp[us] without timezone, which
            # Spark reads as TIMESTAMP_NTZ.  unix_micros()/withWatermark need
            # TIMESTAMP; with spark.sql.session.timeZone=UTC (session.py) the
            # cast is value-exact and matches DuckDB's native micros read.
            df = df.withColumn(col, F.col(col).cast(T.TimestampType()))
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
    table_path = f"{sf_dir}/{name}.parquet"
    batch = spark.read.parquet(table_path)
    schema = batch.schema
    # layout detection via the BATCH read's resolved file list — works on
    # ANY filesystem (s3a/hdfs/file:/ single-slash included), unlike an
    # os.path.isdir probe which is silently False for every remote URI:
    # a directory-layout table resolves to part files INSIDE
    # .../{name}.parquet/, a single-file table to the path itself
    is_dir_layout = any(f"/{name}.parquet/" in f for f in batch.inputFiles())
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if is_dir_layout:
        # table written as a parquet DIRECTORY (part files inside — the
        # layout every real writer produces): stream the directory
        # itself.  A pathGlobFilter on the directory NAME matches no
        # part file and the stream silently reads EMPTY (fuzz-caught
        # r12 — the driver's single-file testdata masked it).
        df = reader.parquet(table_path)
    else:
        # single-file table (the driver's testdata layout): the file
        # stream source wants a directory, so point it at the parent
        # and glob-filter to this table's file
        df = reader.option("pathGlobFilter", f"{name}.parquet").parquet(sf_dir)
    return _fix_timestamps(df, name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all driver tables as temp views (SQL entry point)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
