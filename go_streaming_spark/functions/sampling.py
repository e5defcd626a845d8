"""Deterministic sampling and dataset splitting.

Training-data pipelines need samples and train/test splits that are
REPRODUCIBLE — across reruns, engines, and partitionings.  Spark's
``sample()``/``randomSplit()`` depend on partition layout and seed plumbing;
here membership is a pure function of the row's id: ``md5(seed|id)`` mapped
to a uniform 32-bit value.  Same id → same bucket, on any engine (the DuckDB
oracle computes the identical expression), any cluster size, any day.

Scale: membership is a map-side filter/projection — no shuffle, no state,
prunes straight into downstream scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.dedup import md5_int

_BUCKETS = 1 << 32


def hash_bucket(id_col: Column, seed: str = "sample") -> Column:
    """Uniform value in [0, 2^32) derived from (seed, id) — the shared
    primitive for sampling and splitting."""
    return md5_int(F.concat_ws("|", F.lit(seed), id_col.cast("string")), 8)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — stable under reruns
    and engine changes, unlike ``DataFrame.sample``."""
    threshold = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(id_col), seed) < threshold)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    seed: str = "strat",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]`` of
    each stratum's rows, chosen by id hash (strata absent from ``fractions``
    get ``default``).

    The standard rebalancing step for skewed training corpora (downsample
    the over-represented source/language).  Map-side filter like
    :func:`deterministic_sample` — no shuffle, no per-stratum passes; one
    CASE over the stratum column picks the threshold.
    """
    bucket = hash_bucket(F.col(id_col), seed)
    thr = None
    for stratum, frac in fractions.items():
        t = F.lit(int(frac * _BUCKETS))
        cond = F.col(strata_col) == stratum
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        thr.otherwise(F.lit(int(default * _BUCKETS)))
        if thr is not None
        else F.lit(int(default * _BUCKETS))
    )
    return df.filter(bucket < thr)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label (e.g. train/val/test).

    ``splits`` maps label → fraction (must sum to ≤ 1; remainder gets the
    last label).  Boundaries are cumulative-fraction thresholds over the
    hash bucket, so the same id always lands in the same split.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    cum = 0.0
    labels = list(splits)
    for label in labels[:-1]:
        cum += splits[label]
        cond = bucket < int(cum * _BUCKETS)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(labels[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def corpus_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "shuffle",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic pseudorandom training ORDER: every row gets a shuffle
    key ``md5(seed|id)``, a bucket, and its rank within the bucket — read
    buckets in order, positions within, and you have a reproducible global
    shuffle of the corpus (epoch 2 = new seed).

    Scale: the rank window is PARTITIONED by bucket (same shape as
    ``text.pack_sequences``) — one shuffle, ``n_buckets`` independent
    sorts, no global sort; a reader streams bucket files independently.
    Emits (id, bucket, pos).
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    from pyspark.sql.window import Window

    key = hash_bucket(F.col(id_col), seed)
    w = Window.partitionBy("bucket").orderBy("_key", "id")
    return (
        df.select(
            F.col(id_col).alias("id"),
            key.alias("_key"),
            F.pmod(key, F.lit(n_buckets)).cast("long").alias("bucket"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_key")
    )


def mixture_copy_counts(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    seed: str = "mix",
    default: float = 1.0,
    count_col: str = "n_copies",
) -> DataFrame:
    """Per-row epoch-weighted copy count WITHOUT materializing the copies:
    ``floor(w)`` guaranteed plus one more iff the id hash falls under
    ``frac(w)``.  This is the accounting view of :func:`mixture_sample` —
    every input row survives (possibly with count 0), so per-stratum
    statistics stay visible even for strata whose rows all get 0 copies
    (which :func:`mixture_sample` drops entirely at the explode).
    Map-only, no shuffle."""
    bucket = hash_bucket(F.col(id_col), seed)
    n_copies = None
    for stratum, w in weights.items():
        whole, frac = int(w), w - int(w)
        n = F.lit(whole) + (bucket < F.lit(int(frac * _BUCKETS))).cast("int")
        cond = F.col(strata_col) == stratum
        n_copies = F.when(cond, n) if n_copies is None else n_copies.when(cond, n)
    d_whole, d_frac = int(default), default - int(default)
    d_n = F.lit(d_whole) + (bucket < F.lit(int(d_frac * _BUCKETS))).cast("int")
    n_copies = d_n if n_copies is None else n_copies.otherwise(d_n)
    return df.withColumn(count_col, n_copies)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    seed: str = "mix",
    default: float = 1.0,
    copy_col: str = "copy",
) -> DataFrame:
    """Epoch-weighted data mixing: repeat each stratum's rows ``weight``
    times — ``floor(w)`` guaranteed copies plus one more iff the id hash
    falls under ``frac(w)`` ("source A for 2.5 epochs, B for 0.5").
    Deterministic by id, so the mix reproduces across reruns and engines.

    Map-only: one generated-sequence explode, no shuffle; rows whose copy
    count is 0 drop out at the explode — a stratum whose rows ALL get 0
    copies vanishes from the output (use :func:`mixture_copy_counts` for
    accounting that must see dropped strata).  Guard: ``sequence(1, 0)``
    DESCENDS in Spark, so the sequence is built only when n_copies ≥ 1.
    """
    counted = mixture_copy_counts(
        df, id_col, strata_col, weights, seed, default, count_col="__n_copies"
    )
    copies = F.when(
        F.col("__n_copies") >= 1, F.sequence(F.lit(1), F.col("__n_copies"))
    ).otherwise(F.array().cast("array<int>"))
    return counted.withColumn(copy_col, F.explode(copies)).drop("__n_copies")


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the classic
    exponential-key trick (Efraimidis & Spirakis 2006, A-ES) with the
    randomness derived from the id hash — key = -ln(u)/w, u uniform in
    (0, 1]; the k smallest keys are a weight-proportional sample, stable
    across reruns, engines, and partitionings like everything in this
    module.

    Rows with weight ≤ 0 are excluded (a zero weight has zero inclusion
    probability; negative weights are undefined).

    Scale: key computation is map-side; the top-k is a TakeOrdered
    (per-partition heads merged), never a global sort.  For k large enough
    to strain the driver, cut with an approximate threshold first
    (``percentile_approx`` over the key) and exact-sort the remainder.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = (hash_bucket(F.col(id_col), seed) + 1).cast("double") / F.lit(float(_BUCKETS))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__key", key)
        .orderBy("__key", id_col)
        .limit(k)
        .drop("__key")
    )


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    target_total: int | None = None,
) -> DataFrame:
    """Temperature-flattened mixture weights: sampling share q_s ∝ p_s^α
    with p_s the stratum's corpus share — the exponential-smoothing
    rebalancing of multilingual LM training (α ∈ (0,1) upweights tail
    languages/sources, downweights heads; α=1 is proportional, α=0
    uniform).  Emits (stratum, n_rows, weight) where ``weight`` is the
    per-row copy multiplier making the expected total ≈ ``target_total``
    (default: the input total) — feed it straight to
    :func:`mixture_copy_counts_df`.

    Scale: one map-side-combined groupBy to per-stratum counts; the share
    normalization runs on the tiny counts frame (rows = #strata) via an
    unpartitioned window — never on the corpus.

    Determinism: p^α is quantized to pico-units BEFORE normalizing, so the
    normalizing sum is exact integer arithmetic (a double sum's value
    depends on accumulation order, which no engine guarantees); α=0.5
    routes through ``sqrt``, which IEEE 754 requires correctly rounded —
    bit-identical across engines, unlike ``pow``.
    """
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w = Window.partitionBy()
    total = F.sum("n_rows").over(w)
    share = F.col("n_rows").cast("double") / total.cast("double")
    powed = F.sqrt(share) if float(alpha) == 0.5 else F.pow(share, float(alpha))
    powed_q = F.round(powed * 1e12).cast("long")  # positive → HALF_UP everywhere
    tgt = (
        F.lit(float(target_total))
        if target_total is not None
        else total.cast("double")
    )
    weight = (tgt * powed_q.cast("double")) / (
        F.sum(powed_q).over(w).cast("double") * F.col("n_rows").cast("double")
    )
    return counts.select("stratum", "n_rows", weight.alias("weight"))


def mixture_copy_counts_df(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: DataFrame,
    seed: str = "mix",
    default: float = 1.0,
    count_col: str = "n_copies",
) -> DataFrame:
    """Join-based twin of :func:`mixture_copy_counts`: the per-stratum
    weights arrive as a DataFrame (stratum, weight) — e.g. straight from
    :func:`temperature_weights` — instead of a driver-side dict, so the op
    stays fully declarative for thousands of strata (domain × language
    grids) where a CASE chain would need the weights collected first.

    Same copy rule: ``floor(w)`` guaranteed copies plus one more iff the
    id hash falls under ``frac(w)``.  ``floor`` is explicit (never a
    double→int cast: Spark truncates, other engines round — floor agrees
    everywhere).  Strata missing from ``weights`` get ``default``.

    Scale: the weights frame is stratum-cardinality — AQE broadcasts the
    join; the copy computation is map-side.
    """
    w = F.coalesce(F.col("__w"), F.lit(float(default)))
    bucket = hash_bucket(F.col(id_col), seed)
    whole = F.floor(w)
    extra = (
        bucket < F.floor((w - whole) * F.lit(float(_BUCKETS))).cast("long")
    ).cast("int")
    return (
        df.join(
            weights.select(
                F.col("stratum").alias("__s"), F.col("weight").alias("__w")
            ),
            df[strata_col] == F.col("__s"),
            "left",
        )
        .withColumn(count_col, (whole + extra).cast("int"))
        .drop("__s", "__w")
    )


def stratified_fixed_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    m: int,
    seed: str = "fsample",
) -> DataFrame:
    """EXACTLY ``min(m, |stratum|)`` rows per stratum (vs the per-RATE
    :func:`stratified_sample`): rank rows within each stratum by their id
    hash and keep the first ``m`` — deterministic, engine-portable, and
    uniform within the stratum.  The fixed-size per-group sample every
    eval-set builder and per-source debugging slice needs.

    Scale: one shuffle (the rank window partitions by stratum); skew
    follows stratum size — for a pathological mega-stratum, pre-filter
    with :func:`deterministic_sample` at a rate that overshoots ``m``
    and rank the survivors.
    """
    if m <= 0:
        raise ValueError("m must be positive")
    from pyspark.sql.window import Window

    key = hash_bucket(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy("__key", id_col)
    return (
        df.withColumn("__key", key)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= m)
        .drop("__key", "__rn")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    splits: dict[str, float],
    seed: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Near-duplicate-aware train/val/test assignment: every member of a
    near-dup component receives the SAME label, so paraphrases and exact
    copies can never straddle the train/test boundary (the cross-split
    contamination a plain per-id hash split silently allows — the reason
    dedup-aware splits are standard for LLM eval hygiene).

    ``pairs`` is any (id_a, id_b) near-dup pair frame (MinHash-LSH,
    SimHash, embedding-cosine, ...).  Components come from
    :func:`go_streaming_spark.functions.graph.dedup_components`
    (min-label propagation); the split hash is computed on the component
    representative (min member id) — singletons hash their own id, so
    rows outside any pair keep exactly the :func:`hash_split` labels.

    Scale: the component table is ~|paired docs| rows (tiny vs the
    corpus — near-dup mass is the exception, not the rule), so the
    label join is a candidate for AQE broadcast; everything else is the
    same map-side threshold CASE as :func:`hash_split`.
    """
    from go_streaming_spark.functions.graph import dedup_components

    comps = dedup_components(pairs).withColumnsRenamed(
        {"doc_id": "__lss_id", "cluster_id": "__lss_rep"}
    )
    rep = F.coalesce(F.col("__lss_rep"), F.col(id_col))
    labeled = (
        df.join(comps, df[id_col] == F.col("__lss_id"), "left")
        .withColumn("__lss_key", rep)
        .drop("__lss_id", "__lss_rep")
    )
    out = hash_split(labeled, "__lss_key", splits, seed=seed, split_col=split_col)
    return out.drop("__lss_key")


def bucketed_negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    n_buckets: int = 16,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each row
    gets up to ``k`` pseudo-random partners drawn from its hash bucket —
    the distributed form of in-batch negatives.

    Rows land in ``n_buckets`` buckets by id hash; within a bucket they
    are ordered by a second hash (so neighbors are unrelated documents),
    and row *i* pairs with rows *i+1 … i+k* cyclically.  Every pairing is
    a pure function of (seed, ids): reproducible across engines, reruns,
    and partitionings, unlike `sample()`-based negatives.  Self-pairs are
    impossible while the shift stays below the bucket size, so a bucket
    of *m* rows yields exactly ``min(k, m-1)`` negatives per row.

    Emits (id, slot, neg_id), slot in 1..k.

    Scale: one shuffle into buckets (window sort is per-bucket, fully
    parallel — size buckets via ``n_buckets ≈ corpus/64k`` to keep sorts
    in-memory) and one equi-join on (bucket, position).  No global sort,
    no driver state, no pair explosion: output is exactly k·n rows.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql.window import Window

    sid = F.col(id_col).cast("string")
    base = df.select(
        F.col(id_col).alias("id"),
        (hash_bucket(F.col(id_col), f"{seed}|b") % n_buckets).alias("bucket"),
        md5_int(F.concat_ws("|", F.lit(f"{seed}|p"), sid), 15).alias("pos"),
    )
    w = Window.partitionBy("bucket").orderBy("pos", "id")
    rn = base.select(
        "id", "bucket",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("bucket")).alias("m"),
    )
    probes = (
        rn.select(
            "id", "bucket", "rn", "m",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("slot"),
        )
        .filter(F.col("slot") < F.col("m"))
        .select(
            "id", "slot", "bucket",
            ((F.col("rn") - 1 + F.col("slot")) % F.col("m") + 1).alias("target_rn"),
        )
    )
    ring = rn.select(
        F.col("bucket").alias("r_bucket"),
        F.col("rn").alias("r_rn"),
        F.col("id").alias("neg_id"),
    )
    return probes.join(
        ring,
        (probes.bucket == ring.r_bucket) & (probes.target_rn == ring.r_rn),
    ).select("id", "slot", "neg_id")


def sample_to_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    seed: str = "budget",
) -> DataFrame:
    """Deterministic corpus sampling to a TOKEN budget: rows are ordered
    by their id hash (a reproducible global shuffle) and the maximal
    prefix whose cumulative ``tokens_col`` stays ≤ ``budget`` is kept —
    the "give me exactly ~N tokens of this corpus" op every training-mix
    assembly ends with, as a pure function of (seed, id).

    Scale — a DISTRIBUTED PREFIX SUM, not a global window: the naive
    ``sum() OVER (ORDER BY hash)`` plans a single-partition window (one
    task sorts the corpus).  Instead the hash's first byte buckets rows
    into 256 hash-ordered ranges; per-bucket token totals (256 rows)
    compute running offsets in a trivially small window; each row's
    global cumulative = its bucket offset + its within-bucket cumulative
    (one shuffle on the bucket key, 256-way parallel sort).  Exact
    integer arithmetic end-to-end, so the kept set is engine-identical
    and the DuckDB oracle can verify with the plain global window.

    Rows keep their original columns.  The boundary row that would cross
    the budget is EXCLUDED (strict prefix): the kept total never exceeds
    ``budget``.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    hashed = df.withColumn("__h", h).withColumn(
        "__b", F.conv(F.substring("__h", 1, 2), 16, 10).cast("int")
    )
    totals = hashed.groupBy("__b").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__bt")
    )
    # running offset of all PRECEDING buckets — a ≤256-row window
    off_w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off")
    )
    cum_w = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    kept = (
        hashed.join(F.broadcast(offsets), "__b")
        .withColumn(
            "__cum",
            F.col("__off") + F.sum(F.col(tokens_col).cast("long")).over(cum_w),
        )
        .filter(F.col("__cum") <= F.lit(int(budget)))
        .drop("__h", "__b", "__off", "__cum")
    )
    return kept


def sample_to_token_budget_per_stratum(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    stratum_col: str,
    seed: str = "budget",
) -> DataFrame:
    """:func:`sample_to_token_budget` applied independently WITHIN each
    stratum — the multilingual-mix shape ("≤ N tokens per language /
    source"), still a pure function of (seed, id).

    Same 256-bucket distributed prefix sum, with every window and
    offset partitioned by the stratum: per-(stratum, bucket) totals,
    per-stratum running offsets over ≤256 rows each, within-bucket
    cumulative sums — no single-partition stage anywhere, and strata
    proceed fully in parallel.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    hashed = df.withColumn("__h", h).withColumn(
        "__b", F.conv(F.substring("__h", 1, 2), 16, 10).cast("int")
    )
    totals = hashed.groupBy(stratum_col, "__b").agg(
        F.sum(F.col(tokens_col).cast("long")).alias("__bt")
    )
    off_w = (
        Window.partitionBy(stratum_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        stratum_col,
        "__b",
        F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off"),
    )
    cum_w = (
        Window.partitionBy(stratum_col, "__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hashed.join(F.broadcast(offsets), [stratum_col, "__b"])
        .withColumn(
            "__cum",
            F.col("__off") + F.sum(F.col(tokens_col).cast("long")).over(cum_w),
        )
        .filter(F.col("__cum") <= F.lit(int(budget)))
        .drop("__h", "__b", "__off", "__cum")
    )


def mixture_waterfill_plan(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    budget: int,
    weights: dict[str, int] | None = None,
    pre_aggregated: bool = False,
) -> DataFrame:
    """Token-budget mixture planning by WATERFILLING: given per-stratum
    token totals T_s and target mixture weights w_s, allocate
    used_s = min(T_s, t·w_s) with Σ used_s = budget — small sources
    saturate (everything they have is taken) and their unused share
    redistributes to the rest, the fixed point every ad-hoc
    one-round `min(1, share·B/T)` plan misses.  This is the planning
    step that decides per-source sampling rates BEFORE a 100 TB
    mixture job runs.

    Exact and engine-portable: strata sort ascending by T/w (tie:
    stratum name); a stratum saturates iff
    ``T_i·suffW_i ≤ (budget − prefT_i)·w_i`` — the cross-multiplied
    integer form of "its ratio sits below the remaining water level" —
    evaluated with int64 window sums; the unsaturated allocation is the
    integer floor ``(budget − ΣT_saturated)·w_s div ΣW_unsaturated``.
    No float enters any comparison or output.  Bound: budget·max(w)
    must stay under 2^63 (shard budgets beyond).

    ``weights``: integer weight per stratum (missing strata get 0 and
    are excluded); ``None`` = uniform.  The aggregate frame is
    |strata| rows — the windows are bounded by group cardinality,
    never data-sized.  Emits (stratum, n_docs, n_tokens, w, saturated,
    used_tokens) — used_tokens == n_tokens exactly when saturated.

    ``pre_aggregated=True`` takes ``df`` as the already-reduced
    per-stratum state — (stratum_col, token_col, ``n_docs``) with one
    row per stratum — the ADD-mergeable accumulator a streaming ingest
    carries, so a live re-plan reads |strata| rows and never touches
    raw data.
    """
    if budget < 0:
        raise ValueError("mixture_waterfill_plan: negative budget")
    from pyspark.sql.window import Window

    if pre_aggregated:
        per = df.select(
            F.col(stratum_col).alias("stratum"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col(token_col).cast("long").alias("n_tokens"),
        )
    else:
        per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
        )
    if weights is None:
        per = per.withColumn("w", F.lit(1).cast("long"))
    else:
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(k, int(v)) for k, v in weights.items()], "stratum string, w long"
        )
        per = per.join(F.broadcast(wdf), "stratum", "inner").filter(
            F.col("w") > 0
        )
    w_asc = Window.orderBy(
        (F.col("n_tokens").cast("double") / F.col("w").cast("double")),
        "stratum",
    )
    ranked = per.select(
        "stratum", "n_docs", "n_tokens", "w",
        F.coalesce(
            F.sum("n_tokens").over(
                w_asc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("pref_t"),
        F.sum("w").over(
            w_asc.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        ).alias("suff_w"),
    )
    flagged = ranked.withColumn(
        "saturated",
        (
            F.col("n_tokens") * F.col("suff_w")
            <= (F.lit(int(budget)) - F.col("pref_t")) * F.col("w")
        ).cast("int"),
    )
    totals = flagged.agg(
        F.sum(F.when(F.col("saturated") == 1, F.col("n_tokens"))
              .otherwise(F.lit(0))).alias("sat_t"),
        F.sum(F.when(F.col("saturated") == 0, F.col("w"))
              .otherwise(F.lit(0))).alias("unsat_w"),
    )
    return (
        flagged.crossJoin(F.broadcast(totals))  # 1-row plan scalars
        .select(
            "stratum", "n_docs", "n_tokens", "w", "saturated",
            F.when(F.col("saturated") == 1, F.col("n_tokens"))
            .otherwise(
                F.expr(f"({int(budget)}L - sat_t) * w div unsat_w")
            )
            .cast("long")
            .alias("used_tokens"),
        )
    )
