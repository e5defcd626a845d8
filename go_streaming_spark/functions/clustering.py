"""Embedding clustering (k-means) and cluster-then-dedup (SemDeDup).

The 100 TB curation pattern: cluster the corpus embeddings once, then do
expensive pairwise work WITHIN clusters only (Abbas et al., "SemDeDup",
2023) — the learned-partition complement of the hash-bucket (LSH) and
cell-probe (IVF) blockers already in :mod:`similarity`.

All distance/score arithmetic runs in the int8-quantized space
(:func:`similarity.quantize_embeddings`): exact int64 sums are
summation-order-free, so assignments and pair scores are bit-deterministic
across engines and partitionings — the float-space k-means hazard (BLAS
pairwise summation, last-ulp tie flips) never arises.  Scale shape per op:

- assignment: map-only (centroids are literal arrays — k×dim ints,
  the broadcast-a-summary shape); no shuffle.
- Lloyd update: one map-side-combined groupBy(cluster), k×(dim+1)
  integers collected per iteration (bounded by construction).  Each
  iteration re-plans from the quantized base — centroids travel as
  literals, so lineage does NOT grow with iterations (no checkpoint
  cadence needed, unlike the ingest loop).
- within-cluster pairs: equi-join on the cluster id; quadratic only
  inside a cluster, so size k ~ sqrt(n) keeps per-cluster work flat
  (SemDeDup's own regime).  Hot clusters split via AQE skew-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.similarity import quantize_embeddings


def _cent_lit(centroids: list[list[int]]) -> str:
    rows = ",".join(
        "array(" + ",".join(f"{v}L" for v in c) + ")" for c in centroids
    )
    return f"array({rows})"


def anchor_centroids_q(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    anchor_mod: int = 17,
    anchor_rem: int = 3,
) -> list[list[int]]:
    """Initial centroids = the k smallest ids with
    ``id % anchor_mod == anchor_rem``, int8-quantized — the same
    oracle-reproducible anchor rule as :func:`similarity.pq_codebooks`
    (k-means++ sampling is the production initializer; everything
    downstream is identical either way)."""
    rows = (
        quantize_embeddings(
            df.filter((F.col(id_col) % anchor_mod) == anchor_rem),
            id_col,
            vec_col,
            out_col="qv",
        )
        .orderBy("id")
        .limit(k)
        .select("qv")
        .collect()
    )
    if not rows:
        raise ValueError("anchor_centroids_q: no anchor vectors matched")
    return [[int(x) for x in r[0]] for r in rows]


def kmeans_assign_q(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[int]],
    keep_q: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment in quantized space → (id, cluster
    [, _qb]).  Squared-L2 distances are exact int64 folds over literal
    centroid arrays; ties break to the lowest cluster index
    (``array_position`` first-match).  Map-only — one codegen'd
    projection, no shuffle."""
    base = quantize_embeddings(df, id_col, vec_col, out_col="_q")
    qb = base.select(
        "id", F.expr("transform(_q, x -> CAST(x AS BIGINT))").alias("_qb")
    )
    dist = (
        f"transform({_cent_lit(centroids)}, c -> aggregate("
        "zip_with(_qb, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
    )
    cols = ["id", F.expr(f"array_position({dist}, array_min({dist})) - 1").alias("cluster")]
    if keep_q:
        cols.append(F.col("_qb"))
    return qb.select(*cols)


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[int]],
    iters: int = 5,
) -> list[list[int]]:
    """Lloyd iterations over the quantized space; returns the final
    integer centroids (means re-quantized with floor(sum/count + 1/2),
    so every iteration stays exact-integer and bit-reproducible).

    Per iteration: one map-only assignment + one groupBy(cluster)
    carrying (dim+1) int64 partial sums per cluster per partition — the
    collected update is k×(dim+1) ints, bounded by construction.  Empty
    clusters keep their previous centroid (no respawn heuristics — the
    deterministic choice)."""
    dim = len(centroids[0])
    base = quantize_embeddings(df, id_col, vec_col, out_col="_q").select(
        "id", F.expr("transform(_q, x -> CAST(x AS BIGINT))").alias("_qb")
    )
    sum_aliases = ", ".join(f"sum(_qb[{i}]) AS s{i}" for i in range(dim))
    for _ in range(iters):
        dist = (
            f"transform({_cent_lit(centroids)}, c -> aggregate("
            "zip_with(_qb, c, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v))"
        )
        asg = base.select(
            F.expr(f"array_position({dist}, array_min({dist})) - 1").alias("cluster"),
            "_qb",
        )
        # one parsed SQL aggregate list (the label_centroids lesson:
        # Column-by-Column composition costs ~dim py4j round-trips)
        rows = (
            asg.groupBy("cluster")
            .agg(F.expr("count(*) AS n"), *[F.expr(e) for e in sum_aliases.split(", ")])
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in rows:
            cl = int(r["cluster"])
            n = int(r["n"])
            if n > 0:
                new[cl] = [
                    int((int(r[f"s{i}"]) * 2 + n) // (2 * n))  # floor(s/n + 1/2)
                    for i in range(dim)
                ]
        centroids = new
    return centroids


def semdedup_survivor_stats(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[int]],
    tau: float = 0.4,
) -> DataFrame:
    """Cluster-then-dedup (SemDeDup): assign every vector to its nearest
    centroid, score int8-cosine over pairs WITHIN a cluster only, and
    drop the higher id of every pair at or above ``tau`` (keep-first).
    → (cluster, n_members, n_survivors).

    The cosine is the exact-int64 quantized form (scales cancel), q6-
    quantized before the threshold compare, so survivorship is
    bit-deterministic.  The pair join is an equi-join on the cluster id —
    the whole point of clustering first: quadratic work is confined to
    within-cluster blocks."""
    asg = kmeans_assign_q(df, id_col, vec_col, centroids, keep_q=True)
    a = asg.select(
        F.col("id").alias("ia"), "cluster", F.col("_qb").alias("_qa")
    )
    b = asg.select(
        F.col("id").alias("ib"), "cluster", F.col("_qb").alias("_qx")
    )
    dot = "aggregate(zip_with(_qa, _qx, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    n2a = "aggregate(_qa, 0L, (acc, v) -> acc + v * v)"
    n2b = "aggregate(_qx, 0L, (acc, v) -> acc + v * v)"
    qcos = (
        f"floor(try_divide(CAST(({dot}) AS DOUBLE),"
        f" sqrt(CAST(({n2a}) AS DOUBLE)) * sqrt(CAST(({n2b}) AS DOUBLE)))"
        "*1e6 + 0.5)/1e6"
    )
    removed = (
        a.join(b, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .filter(F.expr(qcos) >= tau)
        .select("ib")
        .distinct()
    )
    return (
        asg.join(removed, asg["id"] == removed["ib"], "left")
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.count(F.when(F.col("ib").isNull(), 1)).alias("n_survivors"),
        )
    )
