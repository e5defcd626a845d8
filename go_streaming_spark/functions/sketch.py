"""Count-min sketch: the mergeable frequency/heavy-hitter sketch (Cormode
& Muthukrishnan 2005) as a DataFrame operator.

Why a sketch at 100 TB: exact per-key counts over a high-cardinality
column (URLs, n-grams, user ids) shuffle one row per distinct key; the
sketch is a FIXED depth×width counter table regardless of data size, its
build is one map-side-combined groupBy, and two sketches merge by
bucket-wise addition — the shape that survives incremental ingestion and
cross-partition aggregation.  Estimates overcount only (never under), by
at most ~N/width with probability 1-2^-depth.

All hash math reuses the minhash universal-hash family over md5-derived
32-bit key digests — int64-exact and engine-portable, so the sketch (and
therefore every estimate) has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    md5_int,
)
from go_streaming_spark.functions.util import spread


def cms_bucket(key: Column, j: int, width: int) -> Column:
    """Row-``j`` bucket of ``key``: ((A_j * h32(key) + B_j) mod P) mod width
    — A_j < 2^30 and h32 < 2^32 keep the product under 2^62 (no int64
    overflow), same argument as the minhash permutations."""
    h = md5_int(key.cast("string"))
    return ((F.lit(MINHASH_A[j]) * h + F.lit(MINHASH_B[j])) % MINHASH_P) % width


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch table (row, bucket, count) over ``key_col``.

    One explode (depth rows per input row) + one map-side-combined
    groupBy; the shuffle carries at most depth×width rows per partition.
    Merge two sketches (e.g. per-day builds) by unioning and summing
    counts on (row, bucket).
    """
    if not 1 <= depth <= len(MINHASH_A):
        raise ValueError(f"depth must be in [1, {len(MINHASH_A)}]")
    key = F.col(key_col)
    buckets = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), cms_bucket(key, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        spread(df)
        .select(F.explode(buckets).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate the frequency of every key in ``keys_df``:
    ``est = min_j sketch[j, h_j(key)]`` (0 when a bucket is absent).

    The keys frame is typically small (candidate heavy hitters) — AQE
    broadcasts it; the estimate never undercounts, so
    ``est >= threshold`` is a SOUND heavy-hitter prefilter: verify the
    survivors exactly, touching only candidate keys.
    """
    key = F.col(key_col)
    probes = keys_df.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        cms_bucket(key, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select("key", "rb.row", "rb.bucket")
    joined = probes.join(sketch, ["row", "bucket"], "left")
    return joined.groupBy("key").agg(
        F.min(F.coalesce(F.col("count"), F.lit(0))).cast("long").alias("est_count")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Exact keys with frequency ≥ ``min_count``, found the sketch way:
    CMS estimates prefilter candidate ROWS map-side (sound — the sketch
    never undercounts, so no true heavy hitter is lost), then ONE exact
    count pass over the surviving rows verifies.  Output equals the exact
    ``GROUP BY ... HAVING count >= t`` — the sketch only changes the cost.

    Two passes, neither shuffling the key cardinality: pass 1 builds the
    sketch (map-side-combined, ≤ depth×width rows cross the wire) and
    pulls the FIXED-SIZE counter table to the driver — the classic
    broadcast-a-summary shape, bounded regardless of data size; pass 2
    embeds the table as array literals, evaluates
    ``est = min_j table[j][h_j(key)]`` as a JVM expression per row, and
    only rows with ``est >= min_count`` reach the exact groupBy — at
    100 TB the overwhelmingly-unique tail is dropped before it ever
    shuffles (the r6 advisory's distinct()-based candidate pass was a
    full-cardinality shuffle; this is the fix).

    Emits (key, n_occ), exact counts.
    """
    table = [[0] * width for _ in range(depth)]
    for r in count_min_build(df, key_col, depth, width).collect():
        table[r["row"]][r["bucket"]] = r["count"]
    key = F.col(key_col)
    ests = [
        F.element_at(
            F.lit(table[j]), (cms_bucket(key, j, width) + 1).cast("int")
        )
        for j in range(depth)
    ]
    est = ests[0] if depth == 1 else F.least(*ests)
    return (
        df.filter(est >= F.lit(min_count))
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
    )
