"""Source/sink format round-trips: the same topic contents survive
parquet → json/csv re-materialization and a streaming file replay, and
partitioned sinks lay out prunable directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_streaming_spark.sources import (
    load_table,
    read_source,
    read_source_stream,
    write_sink,
)
from go_streaming_spark.streaming import replay_to_memory

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_sample(spark):
    return (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )


def _sorted_rows(df):
    return sorted(map(str, df.select("event_id", "user_id", "event_type", "value").collect()))


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_format_round_trip(spark, events_sample, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("fmt") / f"events_{fmt}")
    write_sink(events_sample, path, fmt=fmt)
    back = read_source(spark, path, fmt=fmt, schema=events_sample.schema)
    assert _sorted_rows(back) == _sorted_rows(events_sample)


def test_partitioned_sink_prunes(spark, events_sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_part")
    write_sink(events_sample, path, partition_by=["event_type"])
    back = read_source(spark, path).filter(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at the scan, not post-filter
    assert "PartitionFilters: [" in plan and "event_type" in plan.split("PartitionFilters:")[1].split("]")[0]
    expected = events_sample.filter(F.col("event_type") == "click")
    assert _sorted_rows(back) == _sorted_rows(expected)


def test_streaming_file_source_replay(spark, events_sample, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events_json")
    write_sink(events_sample, path, fmt="json")
    stream = read_source_stream(spark, path, fmt="json", schema=events_sample.schema)
    got = replay_to_memory(stream, spark)
    assert _sorted_rows(got) == _sorted_rows(events_sample)


def test_streaming_requires_schema(spark):
    with pytest.raises(ValueError, match="schema"):
        read_source_stream(spark, "/tmp/nope", fmt="json")
