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
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_session("ab_time")
    out = {}
    for name in args.queries:
        fn = QUERIES[name]
        fn(spark, args.sf).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(args.n):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    print(json.dumps({"sf_dir": args.sf, "runs": args.n, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
