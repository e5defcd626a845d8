"""Custom windowed pipeline operator, mirroring the reference's
customOperator example (`examples/processing/customOperator/main.go:17-38`):
tokenize a text stream and count words per sliding temporal window.

Run: python examples/word_count_window.py
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
from go_streaming_spark.operators.windows import TemporalWindow, windowed_agg
from go_streaming_spark.session import get_session

WORDS = ["hello", "world", "foo", "bar", "streaming", "spark", "rocks", "data", "pipeline"]


def main() -> None:
    spark = get_session("example-wordcount", cores=4)
    engine = Engine(spark)
    rng = random.Random(7)

    base = int(1e6)
    lines = spark.createDataFrame(
        [
            (i, base + i * 100_000, " ".join(rng.choices(WORDS, k=3)))
            for i in range(200)
        ],
        "seq long, t_us long, text string",
    )
    engine.register_stream(
        "user-input",
        to_events(lines, value="text", event_time=F.timestamp_micros("t_us"), seq="seq"),
    )

    # 10-second windows shifting by 1 second; the "custom pipeline operator"
    # is windowed_agg with an arbitrary aggregate — here a word histogram
    policy = TemporalWindow("10 seconds", "1 second")
    q = (
        engine.builder()
        .from_source("user-input")
        .connect(ops.tokenize())
        .connect(
            windowed_agg(
                policy,
                keys=("value",),
                aggs=[F.count(F.lit(1)).alias("n")],
                lineage=False,
            )
        )
        .build(name="word-count")
    )

    out = q.df.groupBy("window_start").agg(
        F.map_from_entries(F.collect_list(F.struct("value", "n"))).alias("counts")
    )
    for row in sorted(out.collect(), key=lambda r: r.window_start)[:5]:
        print(f"word counts for window starting {row.window_start}: {dict(row.counts)}")
    engine.close()
    spark.stop()


if __name__ == "__main__":
    main()
