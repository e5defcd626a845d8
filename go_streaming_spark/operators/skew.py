"""Skew-mitigation helpers.

AQE's skew-join splitting (on in `session.py`) handles most skew at
runtime by splitting oversized partitions; these helpers cover the cases
AQE can't: a *single* join key so hot that one task would still own it
(salting spreads one key across S tasks), and holistic aggregations where
map-side combine doesn't reduce (two-phase salted aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.util import q6


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt`` shards.

    Left rows get a random-but-deterministic shard (hash of all columns);
    right rows are replicated ``salt`` times so every shard finds its match
    — the standard trade of S× replication of the (smaller) right side for
    an S-way split of the hottest key's task.  Result equals the plain
    join exactly (no row gained or lost: each left row joins the one right
    replica with its shard id).

    Only left-preserving join types are valid: a right/full-outer join
    would emit each unmatched right row once per salt replica.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "leftsemi", "leftanti", "leftouter", "cross"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join: right-preserving join type {how!r} unsupported "
            f"(salt replicas would duplicate unmatched right rows); use one of {sorted(allowed)}"
        )
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l.join(r, on=[*on, "_salt"], how=how).drop("_salt")


_SALTED_FNS = {
    # phase-1 aggregate, phase-2 shard merger
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 groups on
    (keys, shard) — the hot key's rows split across ``salt`` tasks —
    phase 2 merges shards.

    ``aggs`` maps output column name → ``(fn, col)`` with fn one of
    sum/count/min/max (re-aggregatable only — holistic aggs don't shard;
    count merges by summing shard counts).
    """
    for name, (fn, _) in aggs.items():
        if fn not in _SALTED_FNS:
            raise ValueError(
                f"non-re-aggregatable aggregate for {name!r}: {fn};"
                f" supported: {sorted(_SALTED_FNS)}"
            )
    sharded = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int"),
    )
    partial = sharded.groupBy(*keys, "_salt").agg(
        *[_SALTED_FNS[fn][0](col).alias(n) for n, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_SALTED_FNS[fn][1](F.col(n)).alias(n) for n, (fn, _) in aggs.items()]
    )


def key_skew_stats(df, key_col: str, top: int | None = 10, with_ratio: bool = False):
    """Join/agg-key skew DIAGNOSTIC: per-key counts reduced to the facts
    that drive a salting decision — the ``top`` hottest keys, and each
    one's share of the total.  Run it on a join key BEFORE the join; a
    top-1 share over ~1/shuffle-partitions means one reducer owns that
    key and :func:`salted_join` / AQE skew-join is warranted.

    ``top=None`` returns every key (unordered — callers wanting all
    keys usually aggregate further).  ``with_ratio=True`` appends
    ``ratio_to_mean`` (n_rows vs the mean per-key count) — the
    imbalance signal shared with the IVF inverted-list audit
    (``similarity.ivf_cell_stats`` is a thin wrapper over this).

    One map-side-combined groupBy + a TakeOrdered of the tiny count
    table; the share division is exact (int/int → double) so the output
    is engine-deterministic.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").alias("__t"), F.count(F.lit(1)).alias("__c")
    )
    cols = [
        F.col("key"),
        F.col("n_rows"),
        q6(F.col("n_rows") / F.col("__t").cast("double")).alias("share"),
    ]
    if with_ratio:
        cols.append(
            q6(
                (F.col("n_rows") * F.col("__c")).cast("double") / F.col("__t")
            ).alias("ratio_to_mean")
        )
    out = counts.crossJoin(F.broadcast(total)).select(*cols)
    if top is None:
        return out
    return out.orderBy(F.col("n_rows").desc(), F.col("key")).limit(top)


def adaptive_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    share_threshold: float = 0.2,
    salt: int = 8,
    top: int = 1,
) -> DataFrame:
    """Skew-aware join wrapper: measure first, salt only when it pays.

    Runs :func:`key_skew_stats` on the left side's join key (one
    map-side-combined groupBy + a ``top``-row collect — bounded driver
    traffic by construction) and routes to :func:`salted_join` when the
    hottest key owns more than ``share_threshold`` of the rows,
    otherwise to the plain equi-join where AQE's runtime skew splitting
    and broadcast promotion do their normal work.  Output is identical
    either way (salted_join is exact); only the physical plan changes.

    The diagnostic pass costs one extra scan of the left side — worth it
    when the join is the dominant stage (the usual case for a fact-fact
    join at 100 TB) and the key distribution is unknown; skip straight
    to :func:`salted_join` when the hot key is known a priori.

    Single-column keys only (the diagnostic measures one column).
    """
    if len(on) != 1:
        raise ValueError("adaptive_join measures a single join column")
    rows = key_skew_stats(left, on[0], top=top).collect()
    hot = max((r["share"] for r in rows), default=0.0)
    if hot > share_threshold:
        return salted_join(left, right, on, salt=salt, how=how)
    return left.join(right, on=on, how=how)
