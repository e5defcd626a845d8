"""Change-data-capture shapes: SCD2 interval history and incremental
latest-wins snapshot maintenance.

A 100 TB training corpus is never rebuilt from scratch — it is *maintained*:
a large existing snapshot (one row per key) plus a small stream of change
rows per refresh.  Two primitives cover the standard warehouse patterns:

- :func:`scd2_history` — version every change row with a
  ``[valid_from, valid_to)`` interval (type-2 slowly-changing dimension),
  so point-in-time joins ("what was the state when this example was
  sampled?") become range lookups.  One shuffle on the key; the
  interval assignment is a single ``lead()`` window.
- :func:`cdc_apply` — merge a change batch into a keyed snapshot with
  latest-wins semantics.  The snapshot is touched only by an anti-join on
  the key (map-side prunable via a Bloom/broadcast of the small change
  key-set; shuffle-free entirely when the snapshot is bucketed on the key
  — ``sources/formats.py:write_bucketed``); the change batch collapses to
  one row per key on its own small shuffle.  Nothing re-aggregates the
  full snapshot — the property that matters when the snapshot is 10⁴×
  the batch.

The reference's closest surface is stream migration / replay
(`pkg/pubsub/pub_sub.go:54-74`): state evolves by applying new events to
retained state.  These operators are that idea as set-based batch algebra.

Determinism: "latest" is the lexicographic max of ``(ts, tie_col)`` with
``tie_col`` unique, so results are partition- and engine-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    sentinel_us: int = 253_402_300_800_000_000,  # 9999-12-31T24 in epoch µs
) -> DataFrame:
    """Type-2 history: every row gains ``valid_from_us`` (its own event
    time) and ``valid_to_us`` (the next change's event time for the same
    key, or ``sentinel_us`` for the current version).

    Same-timestamp changes order by the unique ``tie_col`` — later
    ``tie_col`` wins the later interval, deterministically.  Intervals are
    half-open ``[from, to)`` and partition the key's timeline exactly.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    t = F.unix_micros(F.col(ts_col))
    nxt = F.unix_micros(F.lead(ts_col).over(w))
    return df.withColumn("valid_from_us", t).withColumn(
        "valid_to_us", F.coalesce(nxt, F.lit(sentinel_us))
    )


def latest_per_key(
    df: DataFrame, key_col: str, ts_col: str, tie_col: str
) -> DataFrame:
    """Collapse to one row per key: the row with the greatest
    ``(ts, tie_col)``.  A plain ranking window (one shuffle on the key) —
    used for the *small* change batch; never aim it at the full snapshot.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Latest-wins upsert of a change batch into a one-row-per-key
    snapshot (the MERGE/refresh primitive).

    The change batch collapses to its newest row per key, then replaces
    the snapshot's rows for exactly those keys:
    ``snapshot ANTI⋈ change_keys  ∪  latest(changes)``.  Requires every
    change to be at least as new as the snapshot row it replaces (true by
    construction when changes are captured after the snapshot was built);
    under that contract the result equals ``latest_per_key`` over the full
    concatenated history — the equivalence the oracle checks.

    Scale: the anti-join broadcasts the (tiny) distinct change key-set;
    the snapshot is scanned once, map-side filtered, and never shuffled
    when bucket-laid-out on the key.
    """
    latest = latest_per_key(changes, key_col, ts_col, tie_col)
    keys = latest.select(key_col)
    kept = snapshot.join(F.broadcast(keys), key_col, "left_anti")
    return kept.unionByName(latest)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    digest: bool = False,
) -> DataFrame:
    """Keyed diff of two table versions: one row per differing key with
    ``change`` ∈ {'added', 'removed', 'changed'} — migration validation's
    workhorse (what exactly moved between snapshot N and N+1), the
    row-level complement of the one-row `table_fingerprint` checksum.

    Full outer join on the keys; 'changed' is per-column
    ``IS DISTINCT FROM`` (NULL-safe, engine-exact — no float-to-string
    formatting in the compare path).  ``digest=True`` pre-hashes the
    compare columns to one md5 per side BEFORE the join, cutting shuffle
    width to key+32 bytes for wide rows — the right call at 100 TB, where
    the join shuffles both snapshots; classification is identical because
    md5 is injective on the sentinel-delimited encoding in practice, and
    equal rows always hash equal.  Unchanged keys are dropped (the
    overwhelmingly common case — output ∝ churn, not table size).
    """
    def prep(df: DataFrame, side: str) -> DataFrame:
        if digest:
            enc = F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in compare_cols
                    ],
                )
            )
            cmp_cols = [enc.alias(f"{side}_h")]
        else:
            cmp_cols = [F.col(c).alias(f"{side}_{c}") for c in compare_cols]
        return df.select(
            *[F.col(k).alias(f"{side}_{k}") for k in key_cols], *cmp_cols
        )

    o, n = prep(old, "o"), prep(new, "n")
    cond = [o[f"o_{k}"] == n[f"n_{k}"] for k in key_cols]
    j = o.join(n, cond, "full_outer")
    if digest:
        differs = ~F.col("o_h").eqNullSafe(F.col("n_h"))
    else:
        differs = F.lit(False)
        for c in compare_cols:
            differs = differs | (
                ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}"))
            )
    change = (
        F.when(F.col(f"o_{key_cols[0]}").isNull(), F.lit("added"))
        .when(F.col(f"n_{key_cols[0]}").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    keys_out = [
        F.coalesce(F.col(f"o_{k}"), F.col(f"n_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        j.select(*keys_out, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def partition_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    hash_cols: list[str],
) -> DataFrame:
    """Per-partition order-insensitive checksums — the incremental-copy
    validator: after replicating only the partitions a backfill touched,
    compare ONE row per partition instead of re-fingerprinting the whole
    100 TB table (the grouped form of the table_fingerprint primitive).

    Row hash = 60-bit md5 prefix over the '|'-joined canonical strings
    of ``hash_cols``, folded per group TWO order-insensitive ways:
    ``bit_xor`` (commutative, associative, overflow-free) and a modular
    SUM (decimal-accumulated, reduced mod 2^60 — exact for any row
    count).  The xor alone cancels duplicate rows pairwise (two
    identical rows xor to 0), so two partitions with equal counts but
    different dup-heavy multisets could collide; the sum fold breaks
    exactly that degeneracy (a row appearing twice adds 2h, not 0).
    Two tables' manifests anti-join on (group, xor_hash, sum_hash,
    n_rows) to list exactly the partitions that diverge.  NULL-bearing
    hash_cols need an explicit coalesce sentinel on BOTH engines
    (concat_ws skips NULLs where SQL || nulls the row) — pass
    pre-coalesced columns for those.

    One map-side-combined groupBy; output ∝ partition count.
    """
    from go_streaming_spark.functions.dedup import md5_int

    row_str = F.concat_ws("|", *[F.col(c).cast("string") for c in hash_cols])
    h = md5_int(row_str, hex_chars=15)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(h).alias("xor_hash"),
        # decimal(38,0) accumulation is exact to ~1e20 rows/partition;
        # mod 2^60 brings it back into int64 on both engines
        (F.sum(h.cast("decimal(38,0)")) % F.lit(1 << 60))
        .cast("long")
        .alias("sum_hash"),
    )
