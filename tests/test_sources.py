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


def test_timestamp_encodings_normalize_identically(spark, tmp_path_factory):
    """The driver's parquet has shipped `ts` in two encodings across rounds:
    TIMESTAMP(NANOS) (read as int64 under nanosAsLong) and timestamp[us]
    without timezone (read as TIMESTAMP_NTZ).  _fix_timestamps must map BOTH
    to identical TIMESTAMP values — a third encoding change should fail here
    before it fails 50 gate rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    base = tmp_path_factory.mktemp("ts_encodings")
    micros = [1_700_000_000_000_000 + i * 1_234_567 for i in range(10)]

    nanos_dir, ntz_dir = base / "nanos", base / "ntz"
    for d in (nanos_dir, ntz_dir):
        d.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([m * 1000 for m in micros], pa.timestamp("ns"))}),
        str(nanos_dir / "events.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    pq.write_table(
        pa.table({"ts": pa.array(micros, pa.timestamp("us"))}),
        str(ntz_dir / "events.parquet"),
    )

    got = {}
    for label, d in (("nanos", nanos_dir), ("ntz", ntz_dir)):
        df = load_table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
            label,
            df.schema["ts"].dataType,
        )
        got[label] = sorted(
            r.us for r in df.select(F.unix_micros("ts").alias("us")).collect()
        )
    assert got["nanos"] == got["ntz"] == sorted(micros)


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


def test_read_binary_files_glob_and_size_guard(spark, tmp_path):
    from go_streaming_spark.sources.formats import read_binary_files

    (tmp_path / "a.bin").write_bytes(b"\x01\x02\x03")
    (tmp_path / "b.bin").write_bytes(b"\x04" * 100)
    (tmp_path / "c.txt").write_text("not media")
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == b"\x01\x02\x03"
    assert rows["b.bin"]["length"] == 100
    small = read_binary_files(spark, str(tmp_path), glob="*.bin", max_bytes=10)
    assert [r["path"].split("/")[-1] for r in small.collect()] == ["a.bin"]


def test_compact_small_files_reduces_count_preserves_rows(spark, tmp_path):
    from go_streaming_spark.sources.formats import compact_small_files

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).selectExpr("id", "id % 7 AS k")
    df.repartition(40).write.parquet(src)  # 40 tiny files

    import glob as _glob

    n_in = len(_glob.glob(f"{src}/part-*"))
    assert n_in >= 30
    # huge target → everything folds into one file
    n = compact_small_files(spark, src, out, target_bytes=1 << 30)
    assert n == 1
    assert len(_glob.glob(f"{out}/part-*")) == 1
    a = spark.read.parquet(src).groupBy("k").count().collect()
    b = spark.read.parquet(out).groupBy("k").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_small_files_range_layout_sorts_file_stats(spark, tmp_path):
    """range_cols re-establishes clustering: with 2 output files the id
    ranges must not interleave (file A's max < file B's min)."""
    from go_streaming_spark.sources.formats import compact_small_files

    src = str(tmp_path / "frag2")
    out = str(tmp_path / "ranged")
    spark.range(0, 10_000).repartition(16).write.parquet(src)

    import glob as _glob

    total = sum(
        __import__("os").path.getsize(f) for f in _glob.glob(f"{src}/part-*")
    )
    n = compact_small_files(
        spark, src, out, target_bytes=-(-total // 2), range_cols=["id"]
    )
    assert n == 2
    files = sorted(_glob.glob(f"{out}/part-*"))
    assert len(files) == 2
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(
            {"id": "min"}
        ).collect()[0][0], spark.read.parquet(f).agg({"id": "max"}).collect()[0][0]
        spans.append(r)
    spans.sort()
    assert spans[0][1] < spans[1][0]  # disjoint, ordered ranges


def test_write_training_shards_order_and_manifest(spark, tmp_path):
    """Shards must carry disjoint, sorted key ranges covering every row,
    and each shard must be internally sorted (a trainer reading files in
    name order sees the global order)."""
    from pyspark.sql import functions as F

    from go_streaming_spark.sources.formats import write_training_shards

    df = spark.range(0, 5_000).select(
        F.col("id"),
        F.md5(F.col("id").cast("string")).alias("order_key"),
    )
    out = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, out, "order_key", target_bytes=64 << 10
    ).collect()
    assert sum(r["n_rows"] for r in manifest) == 5_000
    assert len(manifest) >= 2  # small target must split
    spans = sorted((r["min_key"], r["max_key"]) for r in manifest)
    for (lo, hi), (lo2, _hi2) in zip(spans, spans[1:]):
        assert lo <= hi < lo2  # disjoint ordered ranges
    # internal order: per file, the key column is non-decreasing
    import glob as _glob

    for fpath in _glob.glob(f"{out}/part-*"):
        keys = [r["order_key"] for r in spark.read.parquet(fpath).collect()]
        assert keys == sorted(keys)


def test_load_stream_reads_both_table_layouts(spark, tmp_path):
    """load_stream must replay a table whether `{name}.parquet` is a
    single FILE (the driver's testdata layout) or a DIRECTORY of part
    files (what every real parquet writer produces).  The directory
    case used to glob-filter on the directory NAME, match no part file,
    and stream silently EMPTY — fuzz-caught in round 12."""
    import shutil

    from go_streaming_spark.sources.catalog import load_stream
    from go_streaming_spark.streaming.runner import replay_to_memory

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(100)

    # directory layout (writer output)
    d_dir = str(tmp_path / "dirlay")
    src.write.mode("overwrite").parquet(f"{d_dir}/events.parquet")
    got = replay_to_memory(
        load_stream(spark, d_dir, "events"), spark, output_mode="append"
    )
    assert got.count() == 100

    # single-file layout (driver testdata): copy one part file up
    d_file = str(tmp_path / "filelay")
    import glob as _glob
    import os

    os.makedirs(d_file, exist_ok=True)
    part = _glob.glob(f"{d_dir}/events.parquet/part-*.parquet")[0]
    shutil.copy(part, f"{d_file}/events.parquet")
    got2 = replay_to_memory(
        load_stream(spark, d_file, "events"), spark, output_mode="append"
    )
    assert got2.count() == 100
