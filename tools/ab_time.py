#!/usr/bin/env python
"""Min-of-N exclusive timing for named queries — the BASELINE.md anchor
protocol (1 warm-up + N timed runs through the noop sink, per-query
MINIMUM).  Use in a quiet window (loadavg < 1) with no other Spark
session on the box.

    python tools/ab_time.py [-n 5] [--sf DIR] query [query ...]

Prints one JSON line {"sf_dir": ..., "runs": N, "queries": {name: min_sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_streaming_spark.session import get_session  # noqa: E402
from go_streaming_spark.queries import QUERIES  # noqa: E402
import go_streaming_spark.queries_llm  # noqa: E402,F401
import go_streaming_spark.queries_ext  # noqa: E402,F401


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--stat", choices=["min", "median"], default="min",
                    help="median is the anchor rule for write-dominated"
                         " lifecycle gates (BASELINE.md r14)")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_session("ab_time")
    out = {}
    runs = {}
    for name in args.queries:
        fn = QUERIES[name]
        fn(spark, args.sf).write.mode("overwrite").format("noop").save()
        times = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        times.sort()
        stat = times[0] if args.stat == "min" else times[len(times) // 2]
        out[name] = round(stat, 3)
        runs[name] = [round(t, 3) for t in times]
    print(json.dumps({"sf_dir": args.sf, "runs": args.n, "stat": args.stat,
                      "queries": out, "times": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
