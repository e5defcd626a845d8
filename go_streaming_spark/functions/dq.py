"""Data-quality expectation checks (the dbt-tests / Great-Expectations
shape, Spark-first).

A 100 TB ingest without mechanical validation rots silently: NULL keys,
out-of-domain enums, negative money, orphaned foreign keys.  These
operators turn a rule set into ONE aggregation pass (every rule is a
``SUM(CASE)`` over the same scan — adding a rule costs zero extra I/O)
plus one anti-join per referential rule, and emit a tidy
(rule, n_rows, n_violations) report a scheduler can gate on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Evaluate boolean expectation columns in ONE scan.

    ``rules`` maps rule name → a Column that is TRUE when the row
    SATISFIES the expectation; NULL counts as a violation (an
    expectation that cannot be evaluated is not met — the conservative
    reading, and the one that catches NULL-poisoned columns).

    Returns (rule, n_rows, n_violations), one row per rule.  The single
    wide aggregate keeps every rule inside the same map-side partial
    agg; the unpivot to rows touches only the 1-row aggregate output.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), F.lit(0)).otherwise(F.lit(1))
        ).alias(f"__v{i}")
        for i, cond in enumerate(rules.values())
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{n.replace(chr(39), chr(39) * 2)}', __v{i}" for i, n in enumerate(names)
    )
    return wide.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)", "__n AS n_rows"
    ).select("rule", "n_rows", F.col("n_violations").cast("long").alias("n_violations"))


def fk_violations(
    child: DataFrame,
    fk_col: str,
    parent: DataFrame,
    pk_col: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential-integrity check: count child rows whose ``fk_col`` has
    no match in ``parent.pk_col`` (NULL foreign keys count as orphans —
    same conservative reading as :func:`check_expectations`).

    One anti-join shuffled on the key (AQE may broadcast a small parent);
    output is a single (rule, n_rows, n_violations) row, unionable with
    the expectation report.
    """
    rule = rule or f"fk:{fk_col}"
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct()
    joined = child.join(keys, child[fk_col] == F.col("__pk"), "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    ).select(F.lit(rule).alias("rule"), "n_rows", "n_violations")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level profile in one statement: (column, n_rows, n_null,
    n_distinct) per requested column — the first look every new feed
    gets (nullable key? constant column? unexpected cardinality?).

    All counts ride a single aggregate statement; Spark plans the
    multiple COUNT(DISTINCT)s via one Expand (input × |cols| rows, one
    scan, map-side partial aggregation).  For 100 TB-cardinality
    columns swap in the HLL sketch (`sketch.hll_grouped`) — exact
    distinct is kept here because it is oracle-checkable.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null{i}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', __null{i}, __dist{i}"
        for i, c in enumerate(cols)
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, n_null, n_distinct)",
        "__n AS n_rows",
    ).select(
        "column",
        "n_rows",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
