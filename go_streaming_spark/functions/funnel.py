"""Sequential funnel analysis over event streams.

The classic product-analytics query the reference's event model implies but
never ships: of the users who did stage 1, how many went on to stage 2
*after* it, then stage 3 after that, ...  Strict ordering (each stage's
first event must be strictly later than the previous stage's first event).

Scale: one `groupBy(user)` min-aggregation per stage plus an equi-join on
the user id against the previous stage's survivors — every step is
partial-aggregated and AQE-planned; no window over all events, no
per-user event collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def funnel_counts(
    df: DataFrame,
    user_col: str,
    type_col: str,
    time_col: str,
    stages: list[str],
) -> DataFrame:
    """(stage, n_users) — users reaching each funnel prefix in order.

    A user counts for stage k if their earliest stage-k event is strictly
    after their earliest qualifying stage-(k-1) event (first-touch
    attribution).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    t = F.col(time_col)
    if isinstance(df.schema[time_col].dataType, T.TimestampType):
        t = F.unix_micros(t)

    per_stage: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = df.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("user"), t.alias("t")
        )
        if prev is None:
            cur = ev.groupBy("user").agg(F.min("t").alias("t"))
        else:
            p = prev.select("user", F.col("t").alias("_pt"))
            cur = (
                ev.join(p, "user")
                .filter(F.col("t") > F.col("_pt"))
                .groupBy("user")
                .agg(F.min("t").alias("t"))
            )
        per_stage.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(stage).alias("stage"), "n_users"
            )
        )
        prev = cur

    out = per_stage[0]
    for s in per_stage[1:]:
        out = out.unionByName(s)
    return out
