from go_streaming_spark.sources.catalog import TABLES, load_table, register_views
from go_streaming_spark.sources.formats import (
    read_source,
    read_source_stream,
    write_sink,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_source",
    "read_source_stream",
    "write_sink",
]
