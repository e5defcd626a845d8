"""Data-layout operators: Z-order (Morton) clustering for multi-column
locality.

At the 100 TB design point, scan cost is dominated by how well file-level
min/max statistics prune: a table range-partitioned on one column prunes
that column only.  Interleaving the bits of two columns into one Z-address
and range-partitioning on IT gives every file a small rectangle in
(a, b)-space, so predicates on EITHER column skip most files — the
standard multi-dimensional clustering technique (Morton curves; cf. the
OPTIMIZE ZORDER operation of lakehouse table formats and "Learning a
Partitioning Advisor"-era literature).

Everything here is integer arithmetic on the JVM (one generated
``div/%/*/+`` expression, whole-stage codegen'd): no UDF, no shuffle
beyond the final ``repartitionByRange``, and bit-identical across engines
— the same expression text (with ``div`` swapped for ``//``) runs in
DuckDB, which is how the gate query verifies the address math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_address_sql(a: str, b: str, bits: int, div_op: str = "div") -> str:
    """SQL text computing the ``2*bits``-bit Morton interleave of two
    non-negative integer expressions: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1.  Pure ``div/%/*/+`` arithmetic so the same
    text evaluates identically on Spark (``div_op='div'``) and DuckDB
    (``div_op='//'``); inputs must fit in ``bits`` bits (clamp or rescale
    upstream — addresses above the grid silently interleave garbage).
    """
    terms = []
    for i in range(bits):
        terms.append(f"((({a}) {div_op} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({b}) {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def z_address(a: str, b: str, bits: int = 16) -> Column:
    """Morton address as a Column from two SQL expression strings (see
    :func:`z_address_sql`)."""
    return F.expr(z_address_sql(f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)", bits))


def zorder_layout(
    df: DataFrame,
    a: str,
    b: str,
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the Morton
    address of (a, b) — each normalized onto the ``bits``-bit grid from
    its actual min/max (see :func:`scaled_sql`; without it the wider
    column's top bit dominates and the curve degenerates toward a
    single-column sort) — so each output file covers a compact rectangle
    of the (a, b) grid and min/max stats prune on both columns.  Write
    the result with any sink in :mod:`go_streaming_spark.sources.formats`;
    the helper columns are dropped (derivable, not data).  Cost: one tiny
    range aggregate (broadcast back) + the range-partitioning shuffle a
    layout rewrite pays by definition.
    """
    cols = df.columns
    rng = df.select(
        F.min(F.col(a).cast("long")).alias("_alo"),
        F.max(F.col(a).cast("long")).alias("_ahi"),
        F.min(F.col(b).cast("long")).alias("_blo"),
        F.max(F.col(b).cast("long")).alias("_bhi"),
    )
    z_sql = z_address_sql(
        scaled_sql(f"CAST({a} AS BIGINT)", "_alo", "_ahi", bits),
        scaled_sql(f"CAST({b} AS BIGINT)", "_blo", "_bhi", bits),
        bits,
    )
    out = df.crossJoin(F.broadcast(rng)).withColumn("_z", F.expr(z_sql))
    out = (
        out.repartitionByRange(num_files, "_z")
        if num_files
        else out.repartitionByRange("_z")
    )
    return out.sortWithinPartitions("_z").select(*cols)


def scaled_sql(col: str, lo: str, hi: str, bits: int, div_op: str = "div") -> str:
    """Affine-map ``col`` from its data range [lo, hi] onto the full
    ``bits``-bit grid [0, 2**bits - 1] with exact integer arithmetic —
    raw column ranges almost never fill a power-of-two grid, and an
    unfilled grid collapses the high interleave bits (every row lands in
    Z-bucket 0).  Production Z-order does the same normalization from
    table range statistics.  Constant-range guard: hi == lo maps to 0.
    """
    span = f"(CASE WHEN ({hi}) > ({lo}) THEN ({hi}) - ({lo}) ELSE 1 END)"
    return f"(((({col}) - ({lo})) * {(1 << bits) - 1}) {div_op} {span})"


def zorder_bucket_stats(
    df: DataFrame,
    a: str,
    b: str,
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Locality audit of a Z-order layout: normalize both columns onto a
    ``2**bits``-square grid (from their actual min/max — one tiny
    aggregate, broadcast back), cut the Morton address space into
    ``2**bucket_bits`` equal Z-ranges (a proxy for output files), and
    report each bucket's row count and per-column min/max envelope — the
    exact numbers file-skipping would see.  Tight envelopes ⇒ good
    pruning on both columns; one global-range envelope per bucket ⇒ the
    layout degenerated to a single-column sort.
    """
    sel = df.select(
        F.col(a).cast("long").alias("_a"), F.col(b).cast("long").alias("_b")
    )
    rng = sel.agg(
        F.min("_a").alias("_alo"),
        F.max("_a").alias("_ahi"),
        F.min("_b").alias("_blo"),
        F.max("_b").alias("_bhi"),
    )
    z_sql = z_address_sql(
        scaled_sql("_a", "_alo", "_ahi", bits),
        scaled_sql("_b", "_blo", "_bhi", bits),
        bits,
    )
    bucket = F.expr(f"{z_sql} div {1 << (2 * bits - bucket_bits)}")
    return (
        sel.crossJoin(F.broadcast(rng))
        .select(bucket.alias("bucket"), "_a", "_b")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("_a").alias("a_min"),
            F.max("_a").alias("a_max"),
            F.min("_b").alias("b_min"),
            F.max("_b").alias("b_max"),
        )
    )
