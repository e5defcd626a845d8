"""Temporal-window batch subscription over a live stream, mirroring the
reference's batchSubscriberTemporal example
(`examples/pubsub/batchSubscriberTemporal/main.go:15-40`): a subscriber
receives each completed 500 ms window as a batch.

Spark-first: the topic is a streaming DataFrame; the batch callback is a
``foreachBatch`` sink over the windowed aggregation, replayed with
``availableNow`` so the script terminates.

Run: python examples/temporal_batch_subscribe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.events import to_events
from go_streaming_spark.operators.windows import TemporalWindow, windowed_agg
from go_streaming_spark.session import get_session
from go_streaming_spark.sources.formats import write_sink, read_source_stream


def main() -> None:
    spark = get_session("example-temporal-batches", cores=4)
    engine = Engine(spark)

    # stage events into a file-backed topic (≈ publishing to the stream)
    base = int(1e6)
    rows = [(1, base + 100_000), (2, base + 200_000),   # window 1
            (3, base + 700_000),                         # window 2 (flushes 1)
            (4, base + 1_300_000)]                       # window 3 (flushes 2)
    staged = spark.createDataFrame(rows, "value long, t_us long")
    path = "/tmp/example_temporal_topic"
    write_sink(staged, path, fmt="json")

    stream = read_source_stream(spark, path, fmt="json", schema=staged.schema)
    env = to_events(stream, value="value", event_time=F.timestamp_micros("t_us"), seq="value")

    windowed = windowed_agg(
        TemporalWindow("500 milliseconds"),
        aggs=[F.collect_list("value").alias("batch"), F.count(F.lit(1)).alias("n")],
        lineage=False,
    )(env)

    def on_batch(batch_df, batch_id):
        for row in batch_df.collect():
            print(
                f"received time-window batch of {row['n']} events:",
                sorted(row["batch"]),
            )

    q = engine.builder().from_df(windowed).build(name="temporal-batches")
    q.subscribe_batch(on_batch, output_mode="append")
    q.await_done()
    engine.close()
    spark.stop()


if __name__ == "__main__":
    main()
