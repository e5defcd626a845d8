"""Pub/sub basics + counting-window batch subscription, mirroring two
reference examples:

- `examples/pubsub/basics/main.go:11-29`: subscribe a callback to a topic,
  publish one int event (42), receive it in the callback.
- `examples/pubsub/batchSubscriberCount/main.go:22-58`: publish 150 ints
  and receive them as 30 counting-window batches of 5
  (`CountingWindowOption(5, 5)` — tumbling count window).

Spark-first: topics are streaming DataFrames; the per-event callback is a
``foreachBatch`` sink, and the counting window is the engine's stateful
counting-window operator (`operators/windows.py:counting_window_agg` in
batch, `streaming/stateful.py:counting_window_stream*` on a live stream).

Run: python examples/pubsub_basics.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark.events import to_events
from go_streaming_spark.operators.windows import CountingWindow, counting_window_agg
from go_streaming_spark.session import get_session
from go_streaming_spark.sources.formats import read_source_stream, write_sink


def main() -> None:
    spark = get_session("example-pubsub-basics", cores=4)
    engine = Engine(spark)

    # --- 1. basics: per-event Subscribe callback, publish events ----------
    # ≈ query.Subscribe(func(e events.Event[int]) { ... }) — the reference's
    # primary sink (`continuous_query.go:103-116`, `examples/pubsub/main.go`)
    path = "/tmp/example_pubsub_topic"
    staged = spark.createDataFrame(
        [(i, 1_000_000 + i * 1000, 42 + i) for i in range(5)],
        "seq long, t_us long, value long",
    )
    write_sink(staged, path, fmt="json")           # ≈ pub.Publish(NewEvent(v))

    received: list[int] = []

    def on_event(row) -> None:                     # one call per event
        received.append(row.value)
        print(f"Received: {row.value}")

    stream = read_source_stream(spark, path, fmt="json", schema=staged.schema)
    env = to_events(stream, value="value", event_time=F.timestamp_micros("t_us"), seq="seq")
    cq = engine.builder().from_df(env).build()
    cq.subscribe(on_event, ordered_by=["seq"])
    cq.await_done()
    # per-event delivery, in stream (seq) order within each micro-batch
    assert received == [42, 43, 44, 45, 46], received

    # --- 2. counting-window batch subscription: 150 ints, batches of 5 ----
    n_events, batch_size = 150, 5
    # seq is the 0-based dense arrival index (the counting-window contract —
    # operators/windows.py:assign_counting_windows); values are 1..150
    ints = spark.createDataFrame(
        [(i - 1, 1_000_000 + i * 1000, i) for i in range(1, n_events + 1)],
        "seq long, t_us long, value long",
    )
    engine.register_stream(
        "batch-example",
        to_events(ints, value="value", event_time=F.timestamp_micros("t_us"), seq="seq"),
    )
    op = counting_window_agg(
        CountingWindow(batch_size, batch_size),      # tumbling: shift == size
        aggs=[
            F.sort_array(F.collect_list("value")).alias("batch"),
            F.count(F.lit(1)).alias("n"),
        ],
        lineage=False,
    )
    batches = op(engine.stream("batch-example"))
    rows = sorted(batches.collect(), key=lambda r: r.window_id)
    assert len(rows) == n_events // batch_size, len(rows)
    assert all(r.n == batch_size for r in rows)
    print(f"Received {len(rows)} batches of {batch_size}; first: {rows[0].batch}")

    import shutil

    shutil.rmtree("/tmp/example_pubsub_topic", ignore_errors=True)
    shutil.rmtree("/tmp/example_pubsub_ckpt", ignore_errors=True)


if __name__ == "__main__":
    main()
