"""Fluent-builder pipeline, mirroring the reference's builder example
(`examples/processing/builder/main.go:30-76`):

    Source("in") [float]
      -> Greater(0.5) -> Map(*100) -> Convert(int) -> Even
      -> Map(to {id, val}) -> Join(secondary, on id, 1s windows)

Run: python examples/builder_query.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

from pyspark.sql import functions as F

from go_streaming_spark.engine import Engine
from go_streaming_spark import operators as ops
from go_streaming_spark.events import to_events
from go_streaming_spark.operators.joins import window_join
from go_streaming_spark.operators.windows import TemporalWindow
from go_streaming_spark.session import get_session


def main() -> None:
    spark = get_session("example-builder", cores=4)
    engine = Engine(spark)
    rng = random.Random(42)

    # the reference publishes 100 random floats to "in" and {id, info} maps
    # to "secondary"; here the topics are registered DataFrames
    base = int(1e6)
    primary = spark.createDataFrame(
        [(i, base + i * 10_000, rng.random()) for i in range(100)],
        "seq long, t_us long, value double",
    )
    secondary = spark.createDataFrame(
        [(i, base + i * 10_000, rng.randrange(100), "joined") for i in range(100)],
        "seq long, t_us long, id long, info string",
    )
    engine.register_stream(
        "in", to_events(primary, value="value", event_time=F.timestamp_micros("t_us"), seq="seq")
    )
    engine.register_stream(
        "secondary",
        to_events(
            secondary,
            value=F.create_map(
                F.lit("id"), F.col("id").cast("string"),
                F.lit("info"), F.col("info"),
            ),
            event_time=F.timestamp_micros("t_us"),
            seq="seq",
        ),
    )

    policy = TemporalWindow("1 second")
    q = (
        engine.builder()
        .from_source("in")
        .connect(ops.greater(0.5))
        .connect(ops.map_expr(F.col("value") * 100))
        .connect(ops.convert("long"))
        .connect(ops.even())
        .connect(
            ops.map_expr(
                F.create_map(
                    F.lit("id"), F.col("value").cast("string"),
                    F.lit("val"), F.lit("primary"),
                )
            )
        )
        .from_source("secondary")
        .combine(lambda left, right: window_join(left, right, "id", policy))
        .build(name="builder-example")
    )

    for row in q.collect()[:10]:
        print("event received:", dict(row.value))
    engine.close()
    spark.stop()


if __name__ == "__main__":
    main()
