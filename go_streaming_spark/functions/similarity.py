"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: one scan, per-partition
  partial top-k, single merge (TakeOrdered) — the correctness baseline and
  surprisingly competitive when k is small and the scan is the bottleneck.
- :func:`lsh_bucket` / :func:`ann_lsh_topk` — random-hyperplane LSH: H
  deterministic pseudo-hyperplanes → sign-bit bucket key.  Search touches
  only the query's bucket (plus optional 1-bit multiprobe neighbors), so
  the scan cost drops by ~2^H while recall stays high for near-duplicate
  regimes.  At 100 TB the bucket key is also the partition key: writing
  the corpus bucketed by it makes ANN a partition-pruned scan.
- :func:`ivf_topk` — inverted-file variant: coarse centroids (any
  deterministic assignment; a cluster/label column works), probe the
  ``nprobe`` nearest centroids.

All vector math is native Column expressions (``zip_with`` + sequential
``aggregate`` fold — deterministic order, JVM codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def dot_expr_unrolled(a: Column, b: Column, dim: int) -> Column:
    """Dot product unrolled to ``dim`` explicit multiply-adds.

    The higher-order ``aggregate``/``zip_with`` fold is evaluated
    interpreted (one lambda dispatch per element per row); the unrolled
    expression whole-stage-codegens into straight-line arithmetic — ~10×
    faster in all-pairs scoring where it runs per *pair*.  Summation is the
    same left-to-right order as the fold, so results are bit-identical.
    """
    terms = [F.element_at(a, i + 1) * F.element_at(b, i + 1) for i in range(dim)]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def norm_expr_unrolled(a: Column, dim: int) -> Column:
    terms = [F.element_at(a, i + 1) * F.element_at(a, i + 1) for i in range(dim)]
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return F.sqrt(acc)


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    Ordering is (q6(cos) DESC, id ASC) — fully deterministic across
    engines/partitionings.  Plans as TakeOrderedAndProject: no global sort.
    """
    # Unrolled codegen'd dot/norm, built as ONE SQL string: the interpreted
    # fold costs a lambda dispatch per element per row (14.4 s for a
    # 200k×64 scan), and composing 64 terms Column-by-Column costs ~5 s of
    # driver py4j time per query build.  `xD` literals pin doubles; the
    # query norm is a Python-computed double literal (same IEEE ops, same
    # left-to-right order → bit-identical to the JVM fold).  Summation
    # order is unchanged, so values match the fold exactly.
    import math

    dim = len(query_vec)
    q = [float(x) for x in query_vec]
    qs = 0.0
    for x in q:
        qs += x * x
    qn = math.sqrt(qs)
    dot = " + ".join(f"(_v[{i}] * {q[i]!r}D)" for i in range(dim))
    vnorm = " + ".join(f"(_v[{i}] * _v[{i}])" for i in range(dim))
    # try_divide: zero-norm corpus rows get NULL (sorted last by desc),
    # instead of an ANSI DIVIDE_BY_ZERO failure killing the whole scan
    cos = F.expr(f"floor(try_divide(({dot}), sqrt({vnorm}) * {qn!r}D)*1e6 + 0.5)/1e6")
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .select("id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def plane_component(seed: int, p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5(seed|plane|dim) → 32-bit int → scaled.  Engine-portable, and pure
    metadata — computed driver-side, never per row."""
    import hashlib

    raw = int(hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()[:8], 16)
    return raw / 2_147_483_648.0 - 1.0


def lsh_bucket_sql(
    vec_sql: str, dim: int, n_planes: int = 12, seed: int = 42
) -> str:
    """SQL expression string for the LSH bucket id over a double-array
    referenced by ``vec_sql`` (e.g. an aliased ``_v`` column).

    One string for the whole bucket: building n_planes×dim Column objects
    through py4j costs seconds of driver time per call; the parsed string
    produces the identical plan.  ``!r``-repr'd components with a ``D``
    suffix round-trip the exact double, and the left-to-right sum matches
    :func:`dot_expr_unrolled` bit-for-bit.
    """
    parts = []
    for p in range(n_planes):
        dot = " + ".join(
            f"({vec_sql}[{d}] * {plane_component(seed, p, d)!r}D)"
            for d in range(dim)
        )
        parts.append(f"(CASE WHEN ({dot}) >= 0D THEN {1 << p}L ELSE 0L END)")
    return " + ".join(parts)


def lsh_bucket(
    vec: Column, dim: int, n_planes: int = 12, seed: int = 42
) -> Column:
    """Random-hyperplane LSH bucket id (int, 2^n_planes buckets).

    bit_p = [ vec · plane_p >= 0 ].  The plane matrix is seed-deterministic
    *constant data*: its components are embedded as literals (an earlier
    formulation derived each component with per-row md5 expressions —
    n_planes×dim hashes per row); the per-row work is n_planes unrolled
    codegen'd dot products.  Column-tree variant; prefer
    :func:`lsh_bucket_sql` on hot paths (identical plan, ~no driver cost).
    """
    v = vec.cast("array<double>")
    bucket = None
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(plane_component(seed, p, d)) for d in range(dim)]
        )
        score = dot_expr_unrolled(v, plane, dim)  # codegen'd, same sum order
        bit = F.when(score >= 0, F.lit(1 << p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket


def build_lsh_index(
    df: DataFrame,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    cache: bool = True,
) -> DataFrame:
    """One-time LSH index: the corpus with its ``_bucket`` column.

    Bucket computation is the expensive half of an LSH query (n_planes
    dot products per row) — amortize it: build once, query many times.
    At 100 TB, WRITE the result partitioned/bucketed by ``_bucket``
    instead of caching, and every query becomes a partition-pruned scan.
    """
    out = (
        df.withColumn("_v", F.col(vec_col).cast("array<double>"))
        .withColumn("_bucket", F.expr(lsh_bucket_sql("_v", dim, n_planes, seed)))
        .drop("_v")
    )
    return out.cache() if cache else out


def query_probes(
    query_vec: list[float],
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: bool = True,
) -> list[int]:
    """Bucket ids an LSH query must touch: its own bucket + (with
    multiprobe) the 1-bit-flip neighbors.  Driver-side arithmetic."""
    dim = len(query_vec)
    qbucket = 0
    for p in range(n_planes):
        s = sum(query_vec[d] * plane_component(seed, p, d) for d in range(dim))
        qbucket |= (1 if s >= 0 else 0) << p
    return [qbucket] + (
        [qbucket ^ (1 << p) for p in range(n_planes)] if multiprobe else []
    )


def lsh_query(
    index: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Top-k against a prebuilt :func:`build_lsh_index` — scores only the
    probed buckets (~(1+H)/2^H of the corpus)."""
    probes = query_probes(query_vec, n_planes, seed, multiprobe)
    return cosine_topk(
        index.filter(F.col("_bucket").isin(probes)), id_col, vec_col, query_vec, k
    )


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only rows whose LSH bucket matches the
    query's bucket (or differs in one bit, with ``multiprobe``).

    Pick ``n_planes ≈ log2(corpus_size / target_candidates)``: candidates
    scale as n·(1+H)/2^H.  Recall depends on how concentrated true
    neighbors are — LSH shines in near-duplicate regimes; for diffuse
    similarity use more probes or the IVF variant.

    Scale path: precompute/bucket-partition ``lsh_bucket`` at write time and
    this becomes a partition-pruned scan of ~(1+H)/2^H of the corpus.
    """
    dim = len(query_vec)
    index = build_lsh_index(df, vec_col, dim, n_planes, seed, cache=False)
    return lsh_query(
        index, id_col, vec_col, query_vec, k, n_planes, seed, multiprobe
    )


def label_centroids(
    df: DataFrame,
    cluster_col: str,
    vec_col: str,
    dim: int,
    round_to: int = 6,
) -> DataFrame:
    """Per-cluster mean vectors → (cluster_col, vec).

    Elementwise means as ``dim`` wide aggregate columns of one
    ``groupBy(cluster)`` — no posexplode (which would shuffle dim× the
    rows).  Components are floor-quantized so centroid-based probe
    selection is deterministic across engines (float summation order
    differs; ``round(double,k)`` diverges on representation ties).  The
    quantizer is built as ONE parsed SQL string per column — composing
    it Column-by-Column costs ~6 py4j round-trips × dim of driver time
    per query build (measured: +0.3 s at dim=64)."""
    scale = float(10 ** round_to)
    aggs = [
        F.expr(
            f"floor(avg(CAST(`{vec_col}`[{i}] AS DOUBLE)) * {scale!r}D + 0.5D)"
            f" / {scale!r}D"
        ).alias(f"_c{i}")
        for i in range(dim)
    ]
    return df.groupBy(cluster_col).agg(*aggs).select(
        F.col(cluster_col),
        F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("vec"),
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` centroids nearest to the query,
    then exact top-k within their clusters only.

    ``centroids``: (cluster, vec) — e.g. per-label means computed offline.
    The candidate filter is a broadcast semi-join on the cluster id; at
    scale the corpus is written partitioned by cluster so probing prunes
    partitions.
    """
    probe = (
        cosine_topk(centroids, cluster_col, "vec", query_vec, nprobe)
        .select(F.col("id").alias(cluster_col))
    )
    cand = df.join(F.broadcast(probe), cluster_col, "left_semi")
    return cosine_topk(cand, id_col, vec_col, query_vec, k)


def ivf_quantized_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF cell pruning × int8-quantized scoring — the composed 100 TB
    serving shape: the broadcast centroid probe prunes the scan to
    ~nprobe/n_clusters of the corpus (partition pruning when the corpus
    is written partitioned by cluster), and every surviving row is scored
    with the exact-int64 quantized arithmetic that moves 4× fewer bytes
    (:func:`quantized_cosine_topk`) — the two savings multiply.

    Probe selection stays full-precision (the centroid table is tiny and
    picking cells with quantized centroids would change WHICH cells are
    probed); candidate scoring is quantized.  Result = quantized scores
    restricted to the probed cells, deterministic
    (q6(cos) DESC, id ASC).
    """
    probe = (
        cosine_topk(centroids, cluster_col, "vec", query_vec, nprobe)
        .select(F.col("id").alias(cluster_col))
    )
    cand = df.join(F.broadcast(probe), cluster_col, "left_semi")
    return quantized_cosine_topk(cand, id_col, vec_col, query_vec, k)


def quantize_vec(v: list[float]) -> list[int]:
    """Python twin of :func:`quantize_embeddings` for a literal query
    vector — identical IEEE arithmetic, so engine and driver agree."""
    import math

    amax = max(abs(float(x)) for x in v) if v else 0.0
    if amax == 0.0:
        return [0] * len(v)
    scale = amax / 127.0
    return [int(math.floor(float(x) / scale + 0.5)) for x in v]


def quantize_embeddings(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|v|/127``,
    ``q_i = floor(v_i/scale + 1/2)`` ∈ [-127, 127] (the floor(+0.5) form
    rounds identically in Spark, DuckDB and Python — no banker's-rounding
    divergence).  Zero vectors quantize to all-zeros.

    THE storage/shuffle lever for embedding workloads at 100 TB: a 64-dim
    float32 vector is 256 B; its int8 twin is 64 B + one double — 4×
    smaller on disk, in shuffle, and in broadcast, while cosine ordering
    is preserved to ~0.5% (scales cancel in cosine, so scoring needs no
    dequantization at all; ``scale_col`` is kept for reconstructing
    dot products/values).

    Map-only — no shuffle; emits (id, qvec array<tinyint>, qscale).
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, F.abs))
    q = F.when(
        amax > 0,
        F.transform(v, lambda x: F.floor(x / (amax / 127.0) + 0.5).cast("tinyint")),
    ).otherwise(F.transform(v, lambda x: F.lit(0).cast("tinyint")))
    return df.select(
        F.col(id_col).alias("id"),
        q.alias(out_col),
        (amax / 127.0).alias(scale_col),
    )


def quantized_cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Brute-force cosine top-k over int8-QUANTIZED vectors — the 4×-less-
    shuffle companion to :func:`cosine_topk`.  The dot product and squared
    norms are exact int64 arithmetic over the quantized components (scales
    cancel in cosine), so the score is deterministic bit-for-bit across
    engines; only the final sqrt/divide/round touch floating point.

    Ordering: (q6(cos) DESC, id ASC); plans as TakeOrderedAndProject
    (same unrolled codegen'd SQL-string pattern as :func:`cosine_topk` —
    see the driver-time note there).
    """
    import math

    dim = len(query_vec)
    qq = quantize_vec(query_vec)
    qn = math.sqrt(sum(x * x for x in qq))  # exact int sum → one sqrt
    dot = " + ".join(f"(CAST(_q[{i}] AS BIGINT) * {qq[i]}L)" for i in range(dim))
    vq2 = " + ".join(
        f"(CAST(_q[{i}] AS BIGINT) * CAST(_q[{i}] AS BIGINT))" for i in range(dim)
    )
    cos = F.expr(
        f"floor(try_divide(CAST(({dot}) AS DOUBLE),"
        f" sqrt(CAST(({vq2}) AS DOUBLE)) * {qn!r}D)*1e6 + 0.5)/1e6"
    )
    return (
        quantize_embeddings(df, id_col, vec_col, out_col="_q")
        .select("id", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )
