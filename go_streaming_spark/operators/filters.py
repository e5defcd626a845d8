"""Filter-family operators.

Reference: `pkg/processing/default_filter_operators.go` — each passes the
*original* event (stamp preserved) iff the predicate holds, which in Spark is
exactly ``df.filter`` (no column rewrite, so predicate pushdown to the parquet
scan is free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.operators.base import Operator


def filter_(predicate: Column | str, name: str = "Filter") -> Operator:
    """Generic predicate filter (`default_filter_operators.go:11-20`).

    ``predicate`` is a Column expression over the envelope (usually over
    ``value``), or a SQL string.
    """
    cond = F.expr(predicate) if isinstance(predicate, str) else predicate
    return Operator(name, lambda df: df.filter(cond), {"predicate": str(predicate)})


def greater(x) -> Operator:
    """Numeric ``content > x`` (`default_filter_operators.go:23-28`)."""
    return Operator("Greater", lambda df: df.filter(F.col("value") > x), {"x": x})


def smaller(x) -> Operator:
    """Numeric ``content < x`` (`default_filter_operators.go:31-36`)."""
    return Operator("Smaller", lambda df: df.filter(F.col("value") < x), {"x": x})


def _trunc_long(c: Column) -> Column:
    # Go's int(float) truncates toward zero (`default_operators_test.go:117-143`);
    # Spark's cast(long) on doubles truncates toward zero too.
    return c.cast("long")


def even() -> Operator:
    """``int(content) % 2 == 0`` (`default_filter_operators.go:39-44`)."""
    return Operator("Even", lambda df: df.filter(_trunc_long(F.col("value")) % 2 == 0))


def odd() -> Operator:
    """``int(content) % 2 != 0`` (`default_filter_operators.go:47-52`)."""
    return Operator("Odd", lambda df: df.filter(_trunc_long(F.col("value")) % 2 != 0))


def limit(n: int) -> Operator:
    """Pass only the first ``n`` events in arrival order
    (`default_filter_operators.go:55-67` — a global stateful counter).

    Batch semantics: first ``n`` by the explicit ``seq`` arrival column.
    Spark plans this as a top-k (TakeOrderedAndProject): per-partition
    partial top-k then a single merge — no global sort shuffle, scales to
    arbitrarily many input partitions.  Streaming: see
    ``streaming.stateful.stream_limit``.
    """
    return Operator(
        "Limit",
        lambda df: df.orderBy("seq").limit(n),
        {"n": n},
    )


def contains(sub: str) -> Operator:
    """String filter by substring (`default_filter_operators.go:70-75`)."""
    return Operator(
        "Contains",
        lambda df: df.filter(F.col("value").contains(sub)),
        {"sub": sub},
    )
