"""Robust corpus statistics (the quality-control pass of a training-data
pipeline: trust no mean before clamping its tails).

Design: two aggregations over one scan lineage — per-group percentile
bounds, broadcast back, clamp, re-aggregate.  The bounds pass is the only
part that changes with scale: exact ``percentile`` sorts each group's
values (fine to ~10⁸ rows/group), ``percentile_approx`` keeps a fixed-size
KLL-style sketch per group (the 100 TB form — mergeable map-side partials,
no per-group sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    approx_accuracy: int | None = None,
    round_digits: int | None = 6,
) -> DataFrame:
    """Winsorized (outlier-clamped) per-group mean: clamp each group's
    values to its own [p_lo, p_hi] before averaging.

    ``approx_accuracy=None`` computes exact bounds (oracle-able:
    Spark ``percentile`` ≡ DuckDB ``quantile_cont``);  a value (e.g.
    10000 → ~1/10000 relative rank error) switches the bounds pass to
    ``percentile_approx`` — the 100 TB path, where an exact per-group
    sort is the one non-scalable stage.  The clamp join and the second
    aggregation are identical in both modes.

    Emits (group, wins_mean, n_clamped, n).
    """
    if approx_accuracy is None:
        lo_b = F.percentile(value_col, F.lit(lo)).alias("lo")
        hi_b = F.percentile(value_col, F.lit(hi)).alias("hi")
    else:
        lo_b = F.percentile_approx(
            value_col, F.lit(lo), F.lit(approx_accuracy)
        ).alias("lo")
        hi_b = F.percentile_approx(
            value_col, F.lit(hi), F.lit(approx_accuracy)
        ).alias("hi")
    bounds = df.groupBy(group_col).agg(lo_b, hi_b)
    v = F.col(value_col)
    clamped = df.join(F.broadcast(bounds), group_col).select(
        group_col,
        F.least(F.greatest(v, F.col("lo")), F.col("hi")).alias("cv"),
        ((v < F.col("lo")) | (v > F.col("hi"))).cast("long").alias("is_cl"),
    )
    mean = F.avg("cv")
    if round_digits is not None:
        scale = F.lit(float(10 ** round_digits))
        mean = F.floor(mean * scale + F.lit(0.5)) / scale
    return clamped.groupBy(group_col).agg(
        mean.alias("wins_mean"),
        F.sum("is_cl").alias("n_clamped"),
        F.count(F.lit(1)).alias("n"),
    )


def categorical_tv_drift(
    keyed: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """Total-variation distance between each group's distribution over
    ``key_col`` and the all-groups distribution — exact integer
    arithmetic throughout (the generalized core of
    ``text.token_tv_drift``; feed it tokens, histogram bins, enum
    columns, anything categorical).

    Input is one row per OBSERVATION (group, key); output one row per
    group: (group, n, tv_q6).  Keys absent from a group contribute
    algebraically — Σ_{k∉g} c_k·N_g = (N − Σ_{k∈g} c_k)·N_g — so the
    key join touches only existing (group, key) pairs.  Groups with no
    rows are absent (no distribution to compare).

    Shuffles: groupBy(group, key) with map-side combine, groupBy(key)
    over its output, one equi-join on key (unhinted — key cardinality
    grows with the data), one groupBy(group).  Int64 bound: c·N < 2^63
    (≈3e9 observations); beyond that pre-quantize frequencies.
    """
    gt = (
        keyed.select(
            F.col(group_col).alias("grp"), F.col(key_col).alias("k")
        )
        .groupBy("grp", "k")
        .agg(F.count(F.lit(1)).alias("c_gk"))
        # four consumers (per-key totals, per-group totals, the corpus
        # scalar, the join) — column pruning makes their subplans
        # non-identical, so ReuseExchange never fires and the raw
        # observation stream would be recomputed per branch (measured: 4
        # source scans).  Materialize the small aggregate once instead.
        .localCheckpoint()
    )
    ck = gt.groupBy("k").agg(F.sum("c_gk").alias("c_k"))
    totals = gt.groupBy("grp").agg(F.sum("c_gk").alias("n_g"))
    n_all = gt.agg(F.sum("c_gk").alias("n_all"))
    agg = (
        gt.join(ck, "k")
        .crossJoin(F.broadcast(n_all))  # 1-row scalar
        .join(totals, "grp")
        .groupBy("grp")
        .agg(
            F.first("n_g").alias("n_g"),
            F.first("n_all").alias("n_all"),
            F.sum(F.abs(F.col("c_gk") * F.col("n_all") - F.col("c_k") * F.col("n_g")))
            .alias("s_abs"),
            F.sum(F.col("c_k")).alias("ck_present"),
        )
    )
    return agg.selectExpr(
        f"grp AS {group_col}",
        "n_g AS n",
        "(s_abs + (n_all - ck_present) * n_g) * 1000000"
        " div (2 * n_g * n_all) AS tv_q6",
    )


def categorical_psi_drift(
    keyed: DataFrame, group_col: str, key_col: str, epoch_col: str
) -> DataFrame:
    """Population stability index between two epochs of each group's
    distribution over ``key_col`` — the industry-standard "has this
    feature shifted since the reference snapshot" number, complementing
    :func:`categorical_tv_drift` (group vs corpus, bounded metric) with
    an epoch-vs-epoch comparison whose log-ratio terms weight tail
    shifts more heavily: PSI = Σ_k (p_k − q_k)·ln(p_k / q_k).

    Input is one row per OBSERVATION (group, key, epoch) with
    ``epoch_col`` ∈ {0, 1} (0 = reference, 1 = current); output one row
    per group: (group, n_a, n_b, n_bins, psi_u) with ``psi_u`` the PSI
    in 1e-9 units (BIGINT — divide by 1e9 for the conventional number;
    PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    Determinism: probabilities are Laplace-smoothed over the group's
    union support — p = (c+1)/(n+B) with B the group's observed-key
    count — so both epochs are strictly positive on every observed key
    (an epoch-absent key contributes its prior mass, and a group with
    an EMPTY epoch still produces a defined, large PSI).  Each key's
    term is quantized to int64 at 1e9 BEFORE summing, so the result is
    exact integer algebra over per-key doubles computed in one fixed
    IEEE op order — no order-sensitive float accumulation anywhere.

    Rows whose ``epoch_col`` is NULL or outside {0, 1} are EXCLUDED
    before counting (they belong to neither distribution): without the
    filter they would mint (group, key) support rows with zero counts
    on both sides, silently inflating B and skewing every smoothed
    probability.

    Shuffles: one map-side-combined groupBy(group, key) (the counts are
    the statistic — epochs pivot in the same pass), one bounded
    groupBy(group) over it, one broadcast join of the ≤|groups|-row
    totals back.  State is (group, key) pairs — at 100 TB, bins × groups,
    never observations."""
    gk = (
        keyed.select(
            F.col(group_col).alias("grp"),
            F.col(key_col).alias("k"),
            F.col(epoch_col).alias("e"),
        )
        .filter(F.col("e").isin(0, 1))
        .groupBy("grp", "k")
        .agg(
            F.sum(F.when(F.col("e") == 0, 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(F.col("e") == 1, 1).otherwise(0)).alias("c_b"),
        )
        # two consumers (per-group totals + the term join) — same
        # ReuseExchange pruning hazard as categorical_tv_drift, so
        # materialize the small aggregate once
        .localCheckpoint()
    )
    return psi_from_epoch_counts(gk, out_group_col=group_col)


def psi_from_epoch_counts(
    gk: DataFrame, out_group_col: str = "grp"
) -> DataFrame:
    """The PSI derivation of :func:`categorical_psi_drift` from an
    already-counted (grp, k, c_a, c_b) frame — the piece a STREAMING
    accumulator calls on its carried state: per-(group, key) epoch
    counts merge by addition across triggers, and this turns the final
    state into the per-group PSI rows.  The input should be
    materialized (checkpointed state or a localCheckpointed aggregate);
    the work here runs on ≤ groups·keys rows with the ≤|groups|-row
    totals broadcast."""
    tot = gk.groupBy("grp").agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count(F.lit(1)).alias("bg"),
    )
    j = gk.join(F.broadcast(tot), "grp")
    pa = (F.col("c_a").cast("double") + F.lit(1.0)) / (
        F.col("n_a") + F.col("bg")
    )
    pb = (F.col("c_b").cast("double") + F.lit(1.0)) / (
        F.col("n_b") + F.col("bg")
    )
    u = F.floor((pa - pb) * F.log(pa / pb) * F.lit(1e9) + F.lit(0.5)).cast(
        "long"
    )
    return (
        j.groupBy("grp", "n_a", "n_b", "bg")
        .agg(F.sum(u).alias("psi_u"))
        .selectExpr(
            f"grp AS {out_group_col}", "n_a", "n_b", "bg AS n_bins", "psi_u"
        )
    )


def classifier_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """EXACT ROC-AUC of an integer score against a binary label — the
    Mann-Whitney rank statistic, the one-number eval every
    quality-classifier pass ends with ("does this scorer actually rank
    good docs above bad ones?").  Ties get the textbook average-rank
    treatment, so the result matches sklearn's ``roc_auc_score`` on the
    same data.

    All-integer formulation: with tie groups g (count c_g, positives
    p_g) in score order and cumulative count cum_g, twice the positive
    rank-sum is ``Σ p_g·(2·cum_g − c_g + 1)`` (an integer), and

        auc_q6 = (2·ΣR⁺ − n⁺(n⁺+1)) · 10⁶ div (2·n⁺·n⁻)

    is one exact int64 floor division — bit-identical across engines,
    no float ever.  Emits (n, n_pos, n_neg, auc_q6) — one global row,
    or one row per ``group_col`` value (the per-source scorer-health
    report); degenerate single-class inputs yield NULL auc_q6.

    Scale — a DISTRIBUTED PREFIX SUM, not a global window: tie groups
    bucket into ``n_buckets`` score-ordered ranges computed from the
    per-group integer (min, max); per-bucket totals (≤``n_buckets``
    rows per group) compute running offsets in a trivially small
    window; each tie group's cumulative = bucket offset + within-bucket
    cumulative (one shuffle on the bucket key, bucket-parallel sorts) —
    the ``sample_to_token_budget`` pattern, group-partitioned
    throughout when grouped.  (The one single-partition WindowExec the
    ungrouped plan shows is the OFFSETS frame — ≤ ``n_buckets`` rows by
    construction, never data-sized.)  Int64 bound: 2·ΣR⁺·10⁶ ≤ 2n²·10⁶
    needs n ≲ 2·10⁶ rows per AUC; shard and average beyond.
    """
    gcol = (
        F.col(group_col) if group_col is not None else F.lit("")
    ).alias("__g")
    s = df.select(
        gcol,
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    g = s.groupBy("__g", "__s").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__y").alias("__p")
    )
    return classifier_auc_from_tie_groups(g, n_buckets, group_col)


def classifier_auc_from_tie_groups(
    g: DataFrame,
    n_buckets: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """:func:`classifier_auc` from caller-supplied tie-group state
    (__g, __s, __c, __p) — (group, score, count, positives).  Tie groups
    are MERGEABLE BY ADDITION (union per-batch states, groupBy(__g,__s)
    sum the counts), so streaming accumulation in ``foreachBatch``
    yields the exact batch AUC — the sketch-state shape without being a
    sketch."""
    from pyspark.sql.window import Window

    # materialize the tie groups ONCE (narrow rows, ≤ distinct (group,
    # score) pairs — never data-sized): every downstream job (range,
    # bucket totals, offsets broadcast, final rollup) replays this
    # checkpoint instead of re-running the scan+score+shuffle that
    # produced it — the pre-r12 version paid that lineage twice, once
    # for the range materialization and once for the main job (same
    # 6.1 s wall at sf≈1 on 32 local cores, where the duplicate scan
    # hid in idle slack, but twice the cluster work at real scale)
    g = g.localCheckpoint()
    # per-group score range: |groups| rows (1 when ungrouped)
    mm = g.groupBy("__g").agg(
        F.min("__s").alias("lo"), F.max("__s").alias("hi")
    )
    bucketed = g.join(F.broadcast(mm), "__g").withColumn(
        "__b",
        F.expr(f"((__s - lo) * {int(n_buckets)}) div (hi - lo + 1)"),
    )
    totals = bucketed.groupBy("__g", "__b").agg(F.sum("__c").alias("__bt"))
    off_w = (
        Window.partitionBy("__g")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "__g", "__b",
        F.coalesce(F.sum("__bt").over(off_w), F.lit(0)).alias("__off"),
    )
    cum_w = (
        Window.partitionBy("__g", "__b")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), ["__g", "__b"])
        .withColumn("__cum", F.col("__off") + F.sum("__c").over(cum_w))
        .withColumn(
            "__r2", F.col("__p") * (2 * F.col("__cum") - F.col("__c") + 1)
        )
    )
    agg = ranked.groupBy("__g").agg(
        F.sum("__c").alias("n"),
        F.sum("__p").alias("n_pos"),
        F.sum("__r2").alias("__s2"),
    )
    out_cols = ([f"__g AS {group_col}"] if group_col is not None else []) + [
        "n",
        "n_pos",
        "n - n_pos AS n_neg",
        "CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN"
        " (__s2 - n_pos * (n_pos + 1)) * 1000000"
        " div (2 * n_pos * (n - n_pos)) ELSE NULL END AS auc_q6",
    ]
    return agg.selectExpr(*out_cols)


def score_calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram counts for an integer score against a binary
    label — AUC's companion eval (AUC says the scorer RANKS well;
    calibration says whether score bands mean what they claim).  Bins
    are fixed-width over the observed integer [min, max] (rank-free, so
    no tie semantics to bridge), and every number is exact:
    ``rate_q6 = n_pos·10⁶ div n`` per bin.  Emits one row per NON-EMPTY
    bin: (bin, lo_s, n, n_pos, rate_q6).

    ONE scan of the input: rows reduce map-side to (score, n, n_pos)
    tie groups — the same mergeable state shape the streaming AUC
    accumulates — which are localCheckpointed (narrow rows, ≤ distinct
    scores, never data-sized); the 1-row [min, max] range aggregate,
    its broadcast back for the bin assignment, and the bin rollup are
    all cheap jobs over that materialization.  The pre-r12 version
    aggregated the range directly off the input and paid the full
    scan+score TWICE (the broadcast subplan re-executes unmaterialized
    lineage — the r8 ReuseExchange lesson); measured 11.2 s → 3.0 s at
    sf≈1 on the hashed-margin corpus (1.8× wall at 10× data).
    """
    s = df.select(
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    tg = s.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__y").alias("__p")
    ).localCheckpoint()
    mm = tg.agg(F.min("__s").alias("lo"), F.max("__s").alias("hi"))  # 1 row
    binned = tg.crossJoin(F.broadcast(mm)).withColumn(
        "bin", F.expr(f"((__s - lo) * {int(n_bins)}) div (hi - lo + 1)")
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.min("__s").alias("lo_s"),
            F.sum("__n").alias("n"),
            F.sum("__p").alias("n_pos"),
        )
        .selectExpr(
            "bin", "lo_s", "n", "n_pos",
            "(n_pos * 1000000) div n AS rate_q6",
        )
    )


def gram_matrix_long(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str | None = None,
) -> DataFrame:
    """Augmented Gram matrix of integer feature columns as long-form
    rows (i, j, v) with i <= j — the ONE-PASS sufficient statistic of
    linear least squares: with ``label_col`` appended as the last
    column, the output carries X'X (feature block), X'y (the
    label-column entries) and y'y, after which :func:`ridge_fit_from_gram`
    solves for the weights on the driver in O(k³) — training cost at
    100 TB is ONE map-side-combined aggregation over the data, state is
    the fixed (k+1)(k+2)/2 cells regardless of row count, and the
    statistic merges BY ADDITION across partitions, batches, or whole
    corpora (the sketch-state shape, exactly like the tie groups).

    All-integer: products and sums stay int64 — exact, engine-portable.
    Bound: Σ x_i·x_j < 2^63 (≈ rows·(tokens/k)² here; shard and add
    beyond).

    WIDTH bound: this literal form plans ONE aggregate expression per
    (i,j) cell — (k+1)(k+2)/2 columns in a single agg.  Fine at probe
    widths (k=8 → 45 cells); at k≈1024 hashed features that is ~526k
    aggregate expressions and janino/codegen will not survive.  For
    large k use :func:`gram_matrix_exploded` (sparse long form — one
    explode + one map-side-combined groupBy, parity-tested against this
    form), fed by ``hashed_bucket_entries``.
    """
    cols = list(feature_cols) + ([label_col] if label_col else [])
    pairs = [(i, j) for i in range(len(cols)) for j in range(i, len(cols))]
    aggs = [
        F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"v_{i}_{j}")
        for i, j in pairs
    ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"CAST({i} AS BIGINT), CAST({j} AS BIGINT), v_{i}_{j}"
        for i, j in pairs
    )
    return row.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (i, j, v)"
    )


def gram_matrix_exploded(
    df: DataFrame,
    entries_col: str,
    k: int,
    label_col: str | None = None,
    dense: bool = False,
) -> DataFrame:
    """:func:`gram_matrix_long` for REALISTIC probe widths: the same
    augmented gram statistic (i, j, v with i <= j, all int64-exact,
    merges by addition) computed from SPARSE per-row feature entries
    instead of k wide columns — the literal form's single agg plans
    (k+1)(k+2)/2 expressions and blows codegen around k≈10³; this form
    is one explode + one map-side-combined ``groupBy(i, j)`` whatever k
    is, and its work is Σ nnz(row)² instead of rows·k².

    ``entries_col``: ``array<struct<i: long, x: long>>`` of the row's
    NONZERO features (``hashed_bucket_entries`` emits exactly this).
    ``label_col`` appends the label as feature index ``k`` — the output
    then carries X'X, X'y and y'y like the literal form.  Zero entries
    contribute zero products, so cells whose features never co-occur are
    ABSENT from the sparse output (:func:`ridge_fit_from_gram` reads
    missing as 0); ``dense=True`` left-joins the full (i<=j) grid and
    emits explicit zeros — cell-for-cell identical to the literal form.

    Pair generation is pure whole-stage-codegen expression work: the
    sorted entry array binds to a real column first (the repo's
    nested-HOF rule), then ``flatten(transform(es, (e1, ix) ->
    transform(slice(es, ix+1, ...), ...)))`` builds the row's upper
    triangle in place — no self-join, no shuffle before the one
    aggregation.
    """
    m = k + (1 if label_col else 0)
    # NULL-entry rows (e.g. NULL text → NULL token array upstream) must
    # behave like all-zero feature rows, not vanish: concat(NULL, lab)
    # is NULL and explode(NULL) emits nothing — silently dropping the
    # row's y'y/X'y contribution and breaking cell-for-cell parity with
    # the literal form, which sums the non-NULL label regardless
    es = F.coalesce(
        F.col(entries_col), F.array().cast("array<struct<i: long, x: long>>")
    )
    if label_col:
        lab_entry = F.when(
            F.col(label_col).cast("long") != 0,
            F.array(
                F.struct(
                    F.lit(k).cast("long").alias("i"),
                    F.col(label_col).cast("long").alias("x"),
                )
            ),
        ).otherwise(F.array().cast("array<struct<i: long, x: long>>"))
        es = F.concat(es, lab_entry)
    bound = df.select(F.sort_array(es).alias("__es"))
    pairs = F.flatten(
        F.transform(
            F.col("__es"),
            lambda e1, ix: F.transform(
                F.slice(F.col("__es"), ix + 1, F.size(F.col("__es"))),
                lambda e2: F.struct(
                    e1["i"].alias("i"),
                    e2["i"].alias("j"),
                    (e1["x"] * e2["x"]).alias("v"),
                ),
            ),
        )
    )
    sparse = (
        bound.select(F.explode(pairs).alias("p"))
        .select("p.i", "p.j", "p.v")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )
    if not dense:
        return sparse
    spark = df.sparkSession
    grid = (
        spark.range(m)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(m).select(F.col("id").alias("j")))
        .where("i <= j")
    )
    return (
        grid.join(sparse, ["i", "j"], "left")
        .select("i", "j", F.coalesce("v", F.lit(0).cast("long")).alias("v"))
    )


def ridge_fit_from_gram(rows, k: int, lam: float = 1.0):
    """Solve ridge weights from :func:`gram_matrix_long` output rows
    (collected — (k+1)(k+2)/2 cells, driver-trivial at any data size):
    w = (X'X + λI)⁻¹ X'y, where index ``k`` is the label column.
    Returns a length-k numpy vector.  Deterministic: the inputs are
    exact integers, so identical gram rows give bit-identical weights
    wherever they were accumulated.  Accepts the sparse
    :func:`gram_matrix_exploded` output too — absent cells read as 0."""
    import numpy as np

    if not rows:
        raise ValueError(
            "ridge_fit_from_gram: no gram cells — the training frame"
            " was empty"
        )
    xtx = np.zeros((k, k), dtype=np.float64)
    xty = np.zeros(k, dtype=np.float64)
    for r in rows:
        if r["v"] is None:
            # gram_matrix_long over ZERO rows sums to NULL in every cell;
            # fail with the real cause, not a float(None) TypeError
            raise ValueError(
                "ridge_fit_from_gram: NULL gram cell "
                f"(i={r['i']}, j={r['j']}) — the training frame was empty"
            )
        i, j, v = int(r["i"]), int(r["j"]), float(r["v"])
        if i < k and j < k:
            xtx[i, j] = xtx[j, i] = v
        elif i < k and j == k:
            xty[i] = v
    return np.linalg.solve(xtx + lam * np.eye(k), xty)


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    value_col: str,
    k: int,
    h: int,
    scale: float = 1e6,
    bucket_col: Column | None = None,
):
    """Per-key CUSUM drift detection — the classic sequential
    changepoint statistic S_n = max(0, S_{n-1} + (x_n − k)) with an
    alarm when S_n > h — computed DISTRIBUTED via the closed form
    S_n = P_n − min(0, min_{i≤n} P_i), P = prefix sum of (x − k): a
    running max-recurrence becomes prefix sums plus a running minimum,
    both window-expressible.

    Scale shape: a naive per-key ordered window sorts each key's FULL
    history in one task.  Instead rows bucket by an order-aligned range
    (``bucket_col``, default the day of ``ts_col``) and the prefix/min
    stitch in two levels — within-(key, bucket) windows (bounded by a
    bucket's volume) plus one tiny per-(key, bucket) offsets frame
    (≤ keys·buckets rows) carrying exclusive prefix totals and the
    cross-bucket running minimum.  The same 256-bucket trick
    ``sample_to_token_budget`` uses, applied per key.

    All arithmetic is exact int64: values quantize to µ-ints (``q =
    floor(x·scale + 0.5)``), ``k`` and ``h`` are given in the SAME
    µ-int units.  Emits per key: n_events, n_alarms (rows with
    cusum > h), max_cusum.
    """
    from pyspark.sql.window import Window

    b = bucket_col if bucket_col is not None else F.to_date(F.col(ts_col))
    d = (
        F.floor(F.col(value_col).cast("double") * F.lit(scale) + F.lit(0.5))
        .cast("long")
        - F.lit(int(k))
    )
    base = df.select(
        F.col(key_col).alias("__k"),
        b.alias("__b"),
        F.col(ts_col).alias("__ts"),
        F.col(seq_col).alias("__seq"),
        d.alias("__d"),
    )
    w_in = Window.partitionBy("__k", "__b").orderBy("__ts", "__seq")
    prefixed = base.select(
        "__k", "__b", "__ts", "__seq", "__d",
        F.sum("__d").over(w_in).alias("__wp"),
    )
    # the running min follows the SAME order as the prefix sum
    within = prefixed.select(
        "__k", "__b", "__d", "__wp",
        F.min("__wp").over(
            w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__wmin"),
    )
    per_bucket = within.groupBy("__k", "__b").agg(
        F.sum("__d").alias("__tot"),
        F.min("__wp").alias("__bmin"),
    )
    w_b = Window.partitionBy("__k").orderBy("__b")
    offsets = per_bucket.select(
        "__k", "__b",
        F.coalesce(
            F.sum("__tot").over(
                w_b.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("__off"),
        F.col("__bmin"),
    ).select(
        "__k", "__b", "__off",
        F.least(
            F.lit(0).cast("long"),
            F.coalesce(
                F.min(F.col("__off") + F.col("__bmin")).over(
                    w_b.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        ).alias("__pgmin"),
    )
    joined = within.join(F.broadcast(offsets), ["__k", "__b"])
    cusum = (
        (F.col("__off") + F.col("__wp"))
        - F.least(F.col("__pgmin"), F.col("__off") + F.col("__wmin"))
    )
    return (
        joined.withColumn("__cusum", cusum)
        .groupBy(F.col("__k").alias(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("__cusum") > F.lit(int(h))).cast("long")).alias(
                "n_alarms"
            ),
            F.max("__cusum").alias("max_cusum"),
        )
    )
