"""Text analysis operators over document tables.

All pure Column expressions (single-pass, codegen'd, no UDFs): language ID
(marker-word heuristic), quality scoring (length/punct/stopword ratios),
token counting (whitespace + BPE-ish regex), and content fingerprinting
(min-hash over character shingles — winnowing-lite).  Each is deterministic
and engine-portable for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.util import q6, spread

# Minimal marker lexicons (heuristic n-gram/stopword language ID).  Real
# deployments swap in fastText/CLD3 via a pandas UDF; the operator shape
# (per-doc argmax over marker-hit scores) stays the same.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "and", "is", "of", "to", "in", "for"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "para"],
    "fr": ["le", "la", "les", "et", "est", "un", "pour", "dans"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "is", "are", "of", "to", "in", "for",
    "on", "with", "at", "by", "from",
]

# BPE-ish pre-tokenization: word pieces or single non-space symbols
# (the GPT-2 pre-tokenizer shape, ASCII approximation).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words_expr(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language score: distinct marker words present in the text."""
    words = words_expr(F.lower(text))
    return {
        lang: F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def lang_id(text: Column) -> Column:
    """argmax over marker scores; ties break alphabetically; no marker hit
    at all → 'und'.  Deterministic CASE cascade — identical in SQL."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # alphabetical order + .when chain: first language reaching `best` wins
    expr = F.when(best <= 0, F.lit("und"))
    for lang in sorted(scores):
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(result)


def token_counts(
    df: DataFrame, id_col: str, text_col: str, carry: list[str] | None = None
) -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char count per doc;
    ``carry`` columns (e.g. a grouping key) pass through the projection."""
    t = F.col(text_col)
    return spread(df).select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in carry or []],
        F.size(words_expr(t)).cast("long").alias("n_words"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("long").alias("n_bpe_pieces"),
        F.length(t).cast("long").alias("n_chars"),
    )


def quality_exprs(t: Column) -> dict[str, Column]:
    """The per-doc quality feature expressions (single-pass, map-only) —
    shared by :func:`quality_score` and :func:`gopher_quality_flags`."""
    words = words_expr(t)
    n_words = F.size(words).cast("long")
    n_chars = F.length(t).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, F.lower(w))))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    mean_word_len = F.when(n_words > 0, (n_chars - (n_words - 1)) / n_words).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    return {
        "n_words": n_words,
        "n_stopwords": n_stop.cast("long"),
        "n_punct": n_punct.cast("long"),
        "mean_word_len": q6(mean_word_len),
        "stopword_ratio": q6(stop_ratio),
        "alpha_ratio": q6(alpha_ratio),
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features + composite score per doc.

    Features (all single-pass expressions): word count, mean word length,
    stopword ratio, alpha-char ratio, punctuation density.  The composite
    is a fixed linear blend — swap weights per corpus; the point is the
    operator shape (scan-only, no shuffle).
    """
    df = spread(df)
    q = quality_exprs(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        *[expr.alias(name) for name, expr in q.items()],
    )


def char_entropy_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document Shannon entropy over the lowercased ``[a-z0-9 ]``
    character projection — the gibberish/boilerplate signal the ratio
    features in :func:`quality_exprs` miss: base64 blobs and
    hex dumps read HIGH (near-uniform characters), template spam and
    run-on repetition read LOW, natural prose sits in a narrow band
    (the ASCII projection mirrors the ``edit_distance_pairs``
    precedent: both engines agree on it byte-for-byte, where raw
    unicode segmentation would diverge).

    Map-only at any scale: characters are counted with the sorted
    RUN-LENGTH scan (the ``hashed_bucket_entries`` idiom — sort once,
    mark run starts positionally, each count is the gap to the next
    start; every index lambda reads BOUND columns per the repo's
    nested-HOF rule), and each run's (k/n)·ln(n/k) term is quantized
    to 1e-9 int64 BEFORE the per-row integer sum, so the result is
    exact whatever the evaluation order.  No shuffle, no Python, pure
    whole-stage-codegen projection.

    Emits (doc_id, n_chars, ent_u) — ``ent_u`` is entropy in nats at
    1e-9 scale (BIGINT; ln(37) ≈ 3.61 is the projection's ceiling).
    Documents whose projection is empty are omitted (no distribution
    to measure)."""
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    bound = (
        spread(df)
        .select(F.col(id_col).alias("doc_id"), clean.alias("__t"))
        .filter(F.length("__t") > 0)
        .withColumn("__s", F.array_sort(F.split(F.col("__t"), "")))
    )
    s = F.col("__s")
    bound = bound.withColumn("__n", F.size(s)).withColumn(
        "__starts",
        F.filter(
            F.sequence(F.lit(0), F.size(s) - 1),
            lambda p: (p == F.lit(0)) | (F.get(s, p) != F.get(s, p - 1)),
        ),
    )
    starts, nn = F.col("__starts"), F.col("__n")

    def term(p, j):
        k = F.coalesce(F.get(starts, j + 1), nn) - p
        t = (k.cast("double") / nn) * F.log(nn.cast("double") / k)
        return F.floor(t * F.lit(1e9) + F.lit(0.5)).cast("long")

    return bound.select(
        "doc_id",
        nn.alias("n_chars"),
        F.aggregate(
            F.transform(starts, term),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("ent_u"),
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_ratio: float = 0.06,
    max_repetition: float = 0.2,
) -> DataFrame:
    """Rule-based document quality GATE in the Gopher style (Rae et al.
    2021, §A1.1): each rule is a named boolean flag, ``keep`` is their
    conjunction — so a pipeline can both filter (``WHERE keep = 1``) and
    audit WHY documents were dropped (per-flag counts), which the single
    blended score of :func:`quality_score` can't do.  Thresholds are
    per-corpus knobs; defaults are the common pretraining ones.

    Flags (1 = rule violated): too_short / too_long (word count),
    bad_word_len (mean word length outside [min,max]), low_stopword
    (stopword ratio under the floor — gibberish/tables), repetitive
    (duplicate-bigram fraction over the cap, :func:`repetition_ratio`).

    Map-only: one scan, no shuffle, no UDF — at 100 TB this runs at
    parquet-read speed and prunes every downstream operator.
    """
    df = spread(df)
    t = F.col(text_col)
    q = quality_exprs(t)
    rep = q6(repetition_ratio(t, 2))
    too_short = (q["n_words"] < min_words).cast("int")
    too_long = (q["n_words"] > max_words).cast("int")
    bad_word_len = (
        (q["mean_word_len"] < min_mean_word_len)
        | (q["mean_word_len"] > max_mean_word_len)
    ).cast("int")
    low_stopword = (q["stopword_ratio"] < min_stopword_ratio).cast("int")
    repetitive = (rep > max_repetition).cast("int")
    keep = (
        (too_short + too_long + bad_word_len + low_stopword + repetitive) == 0
    ).cast("int")
    return df.select(
        F.col(id_col).alias("id"),
        q["n_words"].alias("n_words"),
        too_short.alias("flag_too_short"),
        too_long.alias("flag_too_long"),
        bad_word_len.alias("flag_bad_word_len"),
        low_stopword.alias("flag_low_stopword"),
        repetitive.alias("flag_repetitive"),
        keep.alias("keep"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-``top_n`` characteristic terms by a tf·(N/df) score
    (the corpus keyword-extraction primitive; log-free so the score is a
    single exact-int product + one double division — bit-identical across
    engines, unlike ln()).

    Shuffles: (1) groupBy(id, token) for tf with map-side combine,
    (2) groupBy(token) for document frequency (tf rows are already distinct
    (id, token), so df = count), (3) equi-join tf⋈df on token, (4) the
    per-doc ranking window.  The corpus size N joins in as a broadcast
    single-row aggregate — no driver-side action.
    """
    from pyspark.sql.window import Window

    toks = spread(df).select(
        F.col(id_col).alias("id"), F.explode(words_expr(F.col(text_col))).alias("token")
    )
    # tf feeds both dfreq and the score join with different pruned
    # columns — ReuseExchange misses, so without materialization the
    # corpus tokenizes once per branch (see categorical_tv_drift)
    tf = (
        toks.groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", q6((F.col("tf") * F.col("n_docs")) / F.col("df")))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select("id", "token", "score", "rn")
    )


def lm_bigram_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document corpus-LM fluency score: the average conditional
    bigram probability P(w2|w1), estimated from the corpus itself and
    held in exact integer µ-units — the log-free analogue of the
    KenLM-perplexity filter (CCNet-style): documents whose word
    transitions are unusual under the corpus LM (garbage, shuffled text,
    wrong-language fragments) score low and get gated.

    Emits (id, n_bigrams, avg_cond_q) where each bigram occurrence
    contributes ``floor(c_xy·10⁶ / c_x)`` (its µ-quantized conditional
    probability) and the document average is one more integer floor —
    every step exact, order-insensitive, engine-identical, like
    :func:`pmi_bigrams` dropping ln().

    Shuffles: per-doc bigram counts (groupBy id,w1,w2 — map-side
    combined), corpus bigram counts, corpus unigram counts; the score
    join is an equi-join on the bigram (the bigram vocabulary grows with
    the corpus — deliberately NOT broadcast), then one groupBy(id).
    """
    # BIND the word array before indexing into it: an unbound split
    # inside the transform lambda re-evaluates per bigram (O(words²)
    # per doc — see word_shingles)
    wdf = spread(df).select(
        F.col(id_col).alias("id"), words_expr(F.col(text_col)).alias("__w")
    )
    w = F.col("__w")
    bi = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.struct(
                F.element_at(w, i + 1).alias("w1"),
                F.element_at(w, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    occ = (
        wdf.select("id", F.explode(bi).alias("b"))
        .select("id", "b.w1", "b.w2")
        # feeds per-doc AND corpus bigram counts — materialize or build
        # the bigram structs twice (see categorical_tv_drift)
        .localCheckpoint()
    )
    db = occ.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    bc = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = spread(df).select(
        F.explode(words_expr(F.col(text_col))).alias("w1")
    )
    uc = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("c_x"))
    scored = (
        db.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .selectExpr("id", "n", "(c_xy * 1000000) div c_x AS s")
    )
    return scored.groupBy("id").agg(
        F.sum("n").alias("n_bigrams"),
        F.expr("sum(n * s) div sum(n)").alias("avg_cond_q"),
    )


def hashed_linear_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    seed: str = "qmodel",
) -> DataFrame:
    """Per-document quality score from a frozen hashed-feature linear
    model — the fastText / CCNet quality-classifier serving shape.

    Every token OCCURRENCE hashes into one of ``n_buckets`` feature
    buckets (the hashing trick, Weinberger et al. 2009) and contributes
    that bucket's integer weight in [-1000, 1000]; the document margin is
    the exact int64 sum.  Weights here derive deterministically from
    (seed, bucket) via the repo's md5 idiom — a frozen-random stand-in
    for learned weights that keeps the DuckDB oracle bit-exact.  A real
    deployment swaps in a trained weight table broadcast as literals (or
    a broadcast join when n_buckets is large); the operator shape is
    unchanged.

    Emits (id, n_tokens, margin, score_q) with
    ``score_q = floor(margin·10⁶ / n_tokens)`` — floor implemented as
    subtract-nonnegative-remainder-then-exact-divide.  Both engines'
    integer division (Spark ``div``, DuckDB ``//``) truncates TOWARD
    ZERO (duckdb: -7//2 = -3), so plain division would round negative
    margins the wrong way on both; removing ``((m % n) + n) % n`` first
    makes the division exact, giving true floor semantics for negative
    margins identically in both engines.  Zero-token docs keep margin 0
    and a NULL score.

    Scale: a pure projection — zero shuffles, zero joins, no UDF; the
    whole model evaluation lives inside whole-stage codegen and a
    score-threshold filter pushes straight into the scan.  CPU ∝ tokens.
    """
    from go_streaming_spark.functions.dedup import md5_int

    toks = words_expr(F.lower(F.col(text_col)))

    def weight(tok: Column) -> Column:
        bucket = md5_int(F.concat_ws("|", F.lit(seed), tok), 8) % n_buckets
        return (
            md5_int(
                F.concat_ws("|", F.lit("w"), F.lit(seed), bucket.cast("string")), 8
            )
            % 2001
            - 1000
        )

    margin = F.aggregate(
        F.transform(toks, weight), F.lit(0).cast("long"), lambda a, x: a + x
    )
    out = spread(df).select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        margin.alias("margin"),
    )
    return out.selectExpr(
        "id",
        "n_tokens",
        "margin",
        "CASE WHEN n_tokens > 0 THEN"
        " (margin * 1000000 - (((margin * 1000000) % n_tokens) + n_tokens)"
        " % n_tokens) div n_tokens ELSE NULL END AS score_q",
    )


def bpe_learn_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 8,
    max_batch: int = 16,
    pass_sizes: list[int] | None = None,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules from a corpus
    (Sennrich et al. 2016) — canonical greedy byte-pair encoding over
    whitespace-pretokenized words.  Emits (rank, pair, n_occ): the k-th
    most valuable merge, its "a b" symbol pair, and the weighted
    occurrence count that won round k.

    The production formulation: the corpus is touched ONCE (a word-count
    groupBy); every iteration then runs over the distinct-word vocabulary
    weighted by frequency — the table real tokenizer trainers iterate on,
    millions of rows where the corpus has trillions of tokens.  Per round:
    one explode+groupBy over vocabulary symbol pairs (map-side combined),
    a 1-row TakeOrdered pull of the winning pair (bounded driver
    traffic), and a vectorized Arrow-batched merge application over the
    vocabulary (greedy left-to-right with skip-after-merge — canonical
    BPE semantics, which string ``replace`` CANNOT reproduce: adjacent
    occurrences share boundary symbols, so ``a a a a`` must become
    ``aa aa``, not ``aa a a``).  Vocabulary is localCheckpointed per
    round — O(1) plan depth in rounds.

    Ties break (count desc, pair asc) — deterministic and
    partition-invariant since counts are exact integers.  The SQL oracle
    unrolls the same greedy rounds via the double-separator replace
    encoding (queries_llm._bpe_learn_oracle); an exact pure-Python
    reference pins the semantics too, the ``pagerank`` pattern.

    BATCHED PASSES (r10): the loop commits up to ``max_batch`` merges
    per corpus pass, and the batch is EXACT — it reproduces the
    one-merge-at-a-time canonical table, not an approximation.  Per
    pass it computes pair counts AND, from the trigram stream, an upper
    bound ``ub(p)`` on the count any pair CREATED by merging ``p``
    could have (a created pair (x,ab)/(ab,y)/(ab,cd) occurrence needs a
    trigram occurrence adjacent to the merged pair, so
    ``ub = max trigram count touching p``; greedy skip-after-merge only
    loses occurrences, never adds).  Candidates are then accepted in
    exact rank order (count desc, pair asc) while each one
    (i) shares no symbol with an already-accepted merge (disjointness
    freezes its count), (ii) neither uses an accepted merge's output
    string as a symbol nor produces an accepted output string (name
    collisions could pool counts), and (iii) strictly outranks every
    accepted merge's ``ub`` (so no created pair can leapfrog it; ties
    stop the batch — a created pair with an equal count could win the
    name tie-break).  The first unsafe candidate ends the batch, so the
    accepted set is a rank prefix and the emitted (rank, pair, n_occ)
    rows are exactly the sequential ones.  Property-tested batched ==
    sequential on random corpora (test_bpe_batched_matches_sequential).

    COST — read before training a real tokenizer with this: each PASS
    is two vocabulary aggregations + one bounded ``limit(T).collect()``
    (T = 4·max_batch rows), and natural-language corpora accept ~3-8
    merges per pass, so a 32k-merge vocabulary is ~4-10k driver
    round-trips instead of 32k single-merge jobs (see SCALE.md §BPE;
    ``max_batch=1`` restores the classic one-job-per-merge loop).  For
    production tokenization, learn merges once and apply them at corpus
    scale via :func:`bpe_encode`, a single embarrassingly-parallel pass.
    """
    import pandas as pd  # noqa: F401  (pandas_udf runtime dep)
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    toks = spread(df).select(
        F.explode(words_expr(F.col(text_col))).alias("word")
    )
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("word"), ""))
        .localCheckpoint()
    )
    merges: list[tuple[int, str, int]] = []
    max_batch = max(1, int(max_batch))
    top_t = 4 * max_batch
    # the live symbol set is tiny (alphabet + one entry per merge) and is
    # maintained driver-side: if a merge's OUTPUT string already exists
    # as a symbol, occurrences pool into existing pairs — any pair
    # touching that symbol can GAIN count, so no later candidate in the
    # same batch is safe (symbols merged away leave stale entries, which
    # only makes the check conservative)
    sym_set = {
        r["s"]
        for r in vocab.select(F.explode("syms").alias("s")).distinct().collect()
    }
    while len(merges) < n_merges:
        # one pass: adjacent-pair counts + per-pair created-pair bound
        pairs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("syms"), i + 1),
                    F.element_at(F.col("syms"), i + 2),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        pc = (
            vocab.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
        )
        top = pc.orderBy(F.col("n").desc(), "pair").limit(top_t).collect()
        if not top:
            break
        cand = [(r["pair"], int(r["n"])) for r in top]
        # the trigram upper bound is only consulted when a SECOND merge
        # could be accepted in this pass — with max_batch=1 (the classic
        # one-job-per-merge loop) it would be pure overhead
        need_ub = max_batch > 1 and len(cand) > 1 and len(merges) + 1 < n_merges
        ub: dict[str, int] = {}
        if need_ub:
            # trigram (x,y,z) touches pair (x,y) at 1-2 and (y,z) at 2-3;
            # any pair created by merging p needs such an adjacent
            # trigram occurrence, so max(count) bounds all of them
            tris = F.when(
                F.size("syms") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 3),
                    lambda i: F.struct(
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("syms"), i + 1),
                            F.element_at(F.col("syms"), i + 2),
                        ).alias("pl"),
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("syms"), i + 2),
                            F.element_at(F.col("syms"), i + 3),
                        ).alias("pr"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<pl:string,pr:string>>")
            )
            cand_pairs = [p for p, _ in cand]
            tg = vocab.select(F.explode(tris).alias("t"), "freq").select(
                "t", F.explode(F.array("t.pl", "t.pr")).alias("pair"), "freq"
            )
            # every created pair is bounded by ONE specific touching
            # trigram's count ((x,ab) by (x,a,b), (ab,y) by (a,b,y),
            # (ab,cd)/(ab,ab) by sub-trigrams of their spawning k-gram),
            # so the per-pair MAX over distinct touching trigrams is a
            # valid bound — and unlike a SUM it stays far below the
            # pair's own count, which is what lets batches form at all
            tgc = (
                tg.filter(F.col("pair").isin(cand_pairs))
                .groupBy("pair", "t")
                .agg(F.sum("freq").alias("n_t"))
                .groupBy("pair")
                .agg(F.max("n_t").alias("ub"))
            )
            ub = {r["pair"]: int(r["ub"]) for r in tgc.collect()}
        batch: list[tuple[str, str, int]] = []  # (a, b, n_occ)
        used_syms: set[str] = set()
        out_strs: set[str] = set()
        max_ub = -1
        for pair, n_occ in cand:
            a, b = pair.split(" ")
            if batch:
                unsafe = (
                    a in used_syms or b in used_syms
                    or a in out_strs or b in out_strs
                    or (a + b) in out_strs
                    or n_occ <= max_ub
                )
                if unsafe:
                    break
            batch.append((a, b, n_occ))
            used_syms.update((a, b))
            out_strs.add(a + b)
            max_ub = max(max_ub, ub.get(pair, 0))
            if a + b in sym_set:
                break  # output pools with an existing symbol: stop batch
            if len(batch) >= max_batch or len(merges) + len(batch) >= n_merges:
                break
        rules = [(a, b) for a, b, _ in batch]

        @pandas_udf("array<string>")
        def apply_batch(s, rules=rules):
            def one(arr):
                for a, b in rules:
                    out, i, n = [], 0, len(arr)
                    merged = a + b
                    while i < n:
                        if i + 1 < n and arr[i] == a and arr[i + 1] == b:
                            out.append(merged)
                            i += 2
                        else:
                            out.append(arr[i])
                            i += 1
                    arr = out
                return arr

            return s.map(one)

        vocab = vocab.withColumn("syms", apply_batch("syms")).localCheckpoint()
        if pass_sizes is not None:  # instrumentation: merges committed/pass
            pass_sizes.append(len(batch))
        for a, b, n_occ in batch:
            merges.append((len(merges) + 1, f"{a} {b}", n_occ))
            sym_set.add(a + b)
    return spark.createDataFrame(
        merges, "rank long, pair string, n_occ long"
    )


def vocab_oov_rates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 10_000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``top_n`` token vocabulary — the tokenizer-prep coverage report
    (how much of each document a fixed vocabulary fails to cover; high
    OOV flags boilerplate, foreign-language and junk documents the
    vocabulary was not built for).

    Emits (id, n_tokens, n_oov, oov_rate) for every document with ≥1
    token; oov_rate is one exact-int division.  The vocabulary is the
    frequency top-``top_n`` with deterministic (count desc, token)
    tie-break — TakeOrdered, no global sort — and broadcasts into a
    left-anti join, so the OOV count shuffles only OOV occurrences;
    per-doc token totals are a map-side ``size()`` (no token-stream
    shuffle, as in :func:`bm25_scores`).
    """
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(words_expr(F.col(text_col))).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(top_n)
        .select("token")
    )
    dl = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.size(words_expr(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    oov = (
        toks.join(F.broadcast(vocab), "token", "left_anti")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    return dl.join(oov, "id", "left").select(
        "id",
        "n_tokens",
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        (
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("double")
            / F.col("n_tokens")
        ).alias("oov_rate"),
    )


def textrank_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    iters: int = 3,
    top_n: int = 50,
) -> DataFrame:
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004): PageRank over
    the word co-occurrence graph, where nodes are tokens and an undirected
    edge weights each adjacent-token pair by its corpus-wide count.
    Centrality-ranked vocabulary complements the frequency
    (:func:`ngram_counts`) and association (:func:`pmi_bigrams`) views —
    a term ranks high when its *neighbors* rank high, not merely when it
    is common.

    Returns the ``top_n`` (term, rk) rows by final rank, int64 µ-unit
    exact via :func:`go_streaming_spark.functions.graph.pagerank` (ties
    break by term).  Graph build is map-only until the edge-count
    groupBy: adjacency pairs explode per document, self-loops drop, and
    symmetry comes from emitting both directions.  The co-occurrence
    graph inherits token Zipf skew as degree skew — see pagerank's hub
    note; at corpus scale, cap the vocabulary (df bounds as in
    :func:`inverted_index`) before ranking.
    """
    from go_streaming_spark.functions.graph import pagerank
    from go_streaming_spark.functions.util import spread

    # BIND the word array before indexing into it (unbound split in the
    # lambda = per-element re-evaluation, O(words²) per doc)
    wdf = spread(df).select(words_expr(F.col(text_col)).alias("__w"))
    w = F.col("__w")
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.struct(
                F.element_at(w, i + 1).alias("u"),
                F.element_at(w, i + 2).alias("v"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<u:string,v:string>>"))
    e0 = (
        wdf.select(F.explode(pairs).alias("p"))
        .select("p.u", "p.v")
        .filter(F.col("u") != F.col("v"))
    )
    sym = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ew = sym.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    ranks = pagerank(ew, "u", "v", "w", iters=iters)
    return (
        ranks.select(F.col("node").alias("term"), "rk")
        .orderBy(F.col("rk").desc(), "term")
        .limit(top_n)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Build a term → postings inverted index over a tokenized corpus:
    one row per surviving term with its document frequency, total term
    frequency, and the full postings list serialized as ``"id:tf,id:tf"``
    in ascending document-id order (a deterministic string so downstream
    storage and the equality oracle need no nested types).

    The sparse-retrieval sibling of :func:`bm25_scores` — the index is
    what a production retrieval stack persists; BM25/TF-IDF scoring then
    reads postings instead of rescanning the corpus.

    Shuffle shape: one groupBy(id, token) for tf (map-side combined), one
    groupBy(token) assembling the postings.  The second shuffle's key
    distribution IS the corpus term distribution — Zipf-skewed — so
    ``max_df`` is the scale valve: terms in more than ``max_df`` documents
    (stopword-class, the hot keys with the giant postings lists *and* the
    least retrieval value) are dropped by an idf-style cutoff, bounding
    both the skew and the widest output row.  ``min_df`` prunes the long
    hapax tail (typos/noise) the same way tokenizer vocabularies do.
    Postings order comes from ``array_sort`` on (id, tf) structs AFTER the
    aggregation — no global sort, no window.
    """
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(words_expr(F.col(text_col))).alias("token"),
    )
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    agg = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df_docs"),
        F.sum("tf").alias("total_tf"),
        F.array_sort(
            F.collect_list(F.struct(F.col("id"), F.col("tf")))
        ).alias("_post"),
    )
    keep = F.col("df_docs") >= min_df
    if max_df is not None:
        keep = keep & (F.col("df_docs") <= max_df)
    return agg.filter(keep).select(
        F.col("token").alias("term"),
        "df_docs",
        "total_tf",
        F.concat_ws(
            ",",
            F.transform(
                F.col("_post"),
                lambda s: F.concat_ws(":", s["id"].cast("string"), s["tf"].cast("string")),
            ),
        ).alias("postings"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of each document to a bag of query terms —
    the classic sparse-retrieval ranking (used for hard-negative mining
    and dedup-aware sampling over training corpora).

    Log-free/engine-exact variant: the idf factor is the raw odds ratio
    ``(N - df + 0.5)/(df + 0.5)`` instead of its logarithm — ``ln()`` is
    the one BM25 ingredient whose last bit differs across engines, and
    dropping it preserves each term's ranking monotonicity.  Every
    per-term score is quantized to an exact int64 (``floor(s·10⁶ + ½)``)
    BEFORE the per-document sum, so the total is an order-insensitive
    integer sum — partition- and engine-invariant — and only the final
    display division produces a double.

    Shuffle shape (mirrors :func:`tf_idf_top_terms`): tokens are filtered
    to the query terms map-side, so the tf groupBy shuffles only matching
    (doc, term) pairs; document length is a map-side ``size()`` of the
    token array — no explode, no groupBy (the exploded-count formulation
    shuffles the entire token stream just to count it; at corpus scale
    that shuffle dwarfs the scoring); corpus totals ride one narrow
    aggregation over the per-doc lengths; df-per-term and the
    (N, total_tokens) scalar join back as broadcasts.  Emits (id, bm25)
    for documents matching ≥1 term.  Zero-token documents drop from the
    corpus statistics (as in the exploded formulation, where they simply
    have no rows).
    """
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(words_expr(F.col(text_col))).alias("token"),
    )
    dl = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.size(words_expr(F.col(text_col))).cast("long").alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )
    tf = (
        toks.filter(F.col("token").isin(query_terms))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfr"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    # every double op below is a single correctly-rounded IEEE operation
    # with the SAME expression tree in the SQL oracle — bit-identical
    dl_ratio = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_tokens"
    )
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_ratio)
    tnorm = (F.col("tf") * F.lit(k1 + 1.0)) / denom
    idf = (F.col("n_docs") - F.col("dfr") + F.lit(0.5)) / (
        F.col("dfr") + F.lit(0.5)
    )
    sq = F.floor(idf * tnorm * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        tf.join(dl, "id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(corpus))
        .withColumn("sq", sq)
        .groupBy("id")
        .agg((F.sum("sq").cast("double") / F.lit(1e6)).alias("bm25"))
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries_df: DataFrame,
    qid_col: str = "query_id",
    term_col: str = "term",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batch BM25 retrieval: the top-``k`` documents for EVERY query in
    ``queries_df`` (query_id, term) — the many-queries-at-once shape of
    hard-negative mining and retrieval-augmented corpus construction,
    where thousands of queries score against the corpus in one plan
    instead of one scan per query.

    Scoring is :func:`bm25_scores`' engine-exact arithmetic (log-free
    odds-ratio idf, per-term int64 quantization before the sum), factored
    so the per-(doc, term) score is computed ONCE regardless of how many
    queries share the term: the corpus tokenizes once, tf filters to the
    union query vocabulary via a broadcast semi-join (query tables are
    small by construction — no literal lists, no driver collect), and
    only then fans out per query.  Emits (query_id, id, bm25, rank) with
    rank 1..k per query, ties broken by id — the final window partitions
    by query, so its shuffle carries candidate rows only.
    """
    terms = queries_df.select(
        F.col(qid_col).alias("qid"), F.col(term_col).alias("token")
    ).distinct()
    toks = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(words_expr(F.col(text_col))).alias("token"),
    )
    # doc length map-side (see bm25_scores: no token-stream shuffle)
    dl = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.size(words_expr(F.col(text_col))).cast("long").alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )
    # dl feeds the corpus scalar and the score join, but its recompute is
    # a cheap map-only scan (no shuffle) — rescanning beats an extra
    # eager materialization job at bench scale, and at 100 TB the scalar
    # branch's extra scan amortizes against the join's
    # tf feeds dfreq and the score join; unlike tf_idf's corpus-wide tf,
    # this one is already cut to the query vocabulary by the broadcast
    # semi-join, so the duplicate derivation shuffles matched rows only —
    # measured CHEAPER than an eager localCheckpoint job at bench scale
    # (2.2 s vs 1.7 s); the re-scan amortizes at 100 TB the same way
    tf = (
        toks.join(F.broadcast(terms.select("token").distinct()), "token")
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfr"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    dl_ratio = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_tokens"
    )
    denom = F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_ratio)
    tnorm = (F.col("tf") * F.lit(k1 + 1.0)) / denom
    idf = (F.col("n_docs") - F.col("dfr") + F.lit(0.5)) / (
        F.col("dfr") + F.lit(0.5)
    )
    sq = F.floor(idf * tnorm * F.lit(1e6) + F.lit(0.5)).cast("long")
    scored = (
        tf.join(dl, "id")
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(corpus))
        .withColumn("sq", sq)
        .join(F.broadcast(terms), "token")
        .groupBy("qid", "id")
        .agg((F.sum("sq").cast("double") / F.lit(1e6)).alias("bm25"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("bm25").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(qid_col), "id", "bm25", "rank")
    )


# PII-ish patterns for corpus scrubbing (ASCII approximations; swap for
# production-grade recognizers via the same regexp_replace chain)
REDACT_PATTERNS: dict[str, str] = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "PHONE": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
    "IPV4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_hit_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, str] | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """Per-document PII match counts, one ``regexp_count`` per pattern in
    ONE scan — the audit that decides whether a source needs scrubbing
    (:func:`redact`) or dropping.

    Each pattern is counted independently on the raw text (a substring
    matched by two patterns counts once under each — the audit question
    is per-pattern exposure, not residual text).  Map-only, codegen'd;
    column per pattern (lower-cased tag) plus ``n_pii`` total; ``carry``
    columns (e.g. the source/domain the report groups by) pass through.
    """
    t = F.col(text_col)
    pats = patterns or REDACT_PATTERNS
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(tag.lower())
        for tag, pat in pats.items()
    ]
    out = spread(df).select(
        F.col(id_col).alias("id"), *[F.col(c) for c in carry or []], *counts
    )
    total = None
    for tag in pats:
        c = F.col(tag.lower())
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def redact(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Replace each PII-ish pattern with its ``[TAG]`` placeholder — the
    standard corpus-scrubbing pass.  A chain of ``regexp_replace`` column
    expressions: single scan, codegen'd, no UDF; order follows the dict
    (email before phone so digit-bearing local parts redact as EMAIL)."""
    out = text
    for tag, pat in (patterns or REDACT_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    banned_ngrams: DataFrame,
    ngram_col: str = "ngram",
    n: int = 3,
) -> DataFrame:
    """Drop documents containing ANY banned word n-gram — test-set
    decontamination for training corpora.

    Docs explode to their distinct n-grams (map-side array, one explode),
    a **left-semi join against the broadcast banned set** finds offending
    ids (the banned list is small — benchmark suites — so the corpus never
    shuffles for the membership test), and a left-anti join on the narrow
    id column drops them.  Matching is exact on the space-joined lowercase
    n-gram.
    """
    words = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    # BIND the word array (unbound split in the lambda = per-element
    # re-evaluation, O(words²) per doc — see word_shingles)
    wdf = df.select(F.col(id_col), words.alias("__w"))
    w = F.col("__w")
    # short-doc guard: sequence(0, -1) descends ([0, -1]) and the slice at
    # start 0 throws — docs with fewer than n words contribute no grams
    grams = F.array_distinct(
        F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    banned = F.broadcast(
        banned_ngrams.select(F.lower(F.col(ngram_col)).alias("_banned_ngram")).distinct()
    )
    offender_ids = (
        wdf.select(F.col(id_col), F.explode(grams).alias("_g"))
        .join(banned, F.col("_g") == F.col("_banned_ngram"), "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(offender_ids, id_col, "left_anti")


def char_shingle_fingerprint(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Winnowing-lite content fingerprint: the minimum md5 over all
    character n-gram shingles — robust to word order at the edges, cheap
    (one pass, array expression, no explode shuffle)."""
    t = F.col(text_col)
    fp = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1))),
            lambda i: F.md5(t.substr(i, F.lit(n))),
        )
    )
    return spread(df).select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """TRUE winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD'03 — the MOSS algorithm): the rolling k-gram hash sequence is
    windowed (width ``w``) and each window contributes its MINIMUM hash;
    the distinct selected minima are the document's fingerprint set.

    Guarantee (the paper's): any substring match of length ≥ w + k − 1
    between two documents shares at least one selected fingerprint —
    unlike a global-min fingerprint (``char_shingle_fingerprint``),
    matches are LOCAL, so a shared paragraph inside otherwise different
    documents is still caught.  Density: ~2/(w+1) of positions selected.

    Emits (id, fp) — one row per distinct selected fingerprint.  The
    whole selection is generated-column arithmetic (substr → md5 → int,
    per-window array_min) evaluated inside codegen: map-only, no UDF,
    no shuffle before the caller's join; CPU ∝ document bytes.  The
    DuckDB oracle reproduces it bit-for-bit with the identical
    ``'0x' || substr(md5(gram),1,8)`` integer hash.
    """
    if k <= 0 or w <= 0:
        raise ValueError("k and w must be positive")
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - k + 1, F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.conv(F.substring(F.md5(t.substr(i, F.lit(k))), 1, 8), 16, 10)
        .cast("long"),
    )
    # BIND the hash array as a real column before windowing: a nested
    # HOF that references an unmaterialized transform EXPRESSION gets it
    # inlined per outer element — every window would recompute all L
    # md5s, turning the doc cost quadratic (measured: 16× per 10× data
    # before this split; linear after).  Two projections = one
    # evaluation of each array per row.
    hashed = spread(df).select(F.col(id_col).alias("id"), hashes.alias("_h"))
    sel = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size(F.col("_h")) - w + 1, F.lit(1))
            ),
            lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
        )
    )
    return hashed.select("id", F.explode(sel).alias("fp"))


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping windows —
    the fixed-context chunking step of a training-data pipeline
    (stride < chunk_size ⇒ chunk_size - stride tokens of overlap).

    One generated-column explode per doc (no shuffle, no UDF): chunk
    starts are ``sequence(0, n_tokens-1, stride)``; each chunk is an
    ``array_join(slice(...))``.  Emits (id, chunk_id, n_tokens, chunk).
    The tail chunk keeps whatever tokens remain (standard sliding window).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = words_expr(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    out = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.explode(starts).alias("_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size)
    return out.select(
        "id",
        (F.col("_start") / stride).cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int = 512,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences (the
    "pack docs into context windows" step of a training-data pipeline).

    Policy: token-OFFSET packing — within a bucket, documents are laid out
    contiguously in id order and each doc joins the sequence containing its
    first token's offset (``seq_id = start_offset div budget``).  This is a
    pure window cumsum: deterministic, engine-agnostic, and oracle-able —
    unlike greedy bin-packing, whose sequential accept/reject state neither
    distributes nor reproduces across engines.

    Scale: the cumsum window is PARTITIONED by a hash bucket of the id, so
    packing runs as ``n_buckets`` independent sorted partitions — one
    shuffle, no global sort.  At 100 TB raise ``n_buckets`` until each
    bucket's docs fit a task; sequences never cross buckets, which is the
    point (any worker can materialize its sequences without coordination).

    Emits (id, bucket, n_tokens, start_off, seq_id).
    """
    if budget <= 0 or n_buckets <= 0:
        raise ValueError("budget and n_buckets must be positive")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL text must count as 0 tokens, not Spark's size-of-null -1 (which
    # would corrupt every later start_off in the bucket); DuckDB's oracle
    # says NULL here, so both sides coalesce to 0 explicitly.
    toks = F.when(
        F.col(text_col).isNull(), F.lit(0).cast("long")
    ).otherwise(F.size(words_expr(F.col(text_col))).cast("long"))
    return (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.pmod(F.col(id_col), F.lit(n_buckets)).cast("long").alias("bucket"),
            toks.alias("n_tokens"),
        )
        .withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr(f"start_off div {budget}"))
    )


def normalize_for_dedup(text: Column) -> Column:
    """Canonical text form for duplicate detection (the C4/RefinedWeb-style
    precursor to exact dedup): lowercase, strip everything but
    alphanumerics and whitespace, collapse whitespace runs, trim.  Catches
    the near-universal trivial duplicates — casing, punctuation and
    spacing variants — that raw-byte dedup misses.

    Pure JVM expression chain (no UDF).  Whitespace is an EXPLICIT class
    ``[ \\t\\n\\r\\f\\x0B]`` rather than ``\\s`` because Java's ``\\s``
    includes vertical tab while RE2-family engines' does not — the
    explicit class makes Java and RE2 agree byte-for-byte on every input.
    (Full Unicode NFKC folding needs ICU, which neither test engine has;
    plug it in as a pandas UDF where the dependency exists.)
    """
    ws = r" \t\n\r\f\x0B"
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, f"[^a-z0-9{ws}]+", "")
    collapsed = F.regexp_replace(stripped, f"[{ws}]+", " ")
    return F.trim(collapsed)


def repetition_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of within-document duplicate word n-grams (Gopher-style
    repetition quality signal): 1 - distinct/total.  0.0 for documents
    with fewer than n tokens.  Single array expression — map-only,
    and exact: an integer ratio divided once, so engines agree bitwise."""
    words = words_expr(text)
    # index-free gram construction: this is a COLUMN helper (no frame to
    # bind into), and an index lambda referencing the unmaterialized
    # split re-evaluates it per element (O(words²) per doc).  Instead,
    # build grams by iterated zip_with against shifted slices — every
    # reference to `words` is top-level (evaluated once per row, not per
    # element), and zip_with's null padding marks the <n-word tail
    # (F.concat propagates null, unlike concat_ws), which filter drops.
    # Short docs fall out naturally: zip of a 1-word array with an empty
    # shift yields one null → empty gram list, no sequence(0,-1) hazard.
    grams = words
    for j in range(1, n):
        shifted = F.slice(
            words, j + 1, F.greatest(F.size(words) - j, F.lit(0))
        )
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    grams = F.filter(grams, lambda g: g.isNotNull())
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double")
    )


def ngram_counts(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Corpus-wide word n-gram frequencies → (gram, n_docs, n_occ) — the
    vocabulary/statistics pass of tokenizer training (BPE merge candidates,
    stopword discovery, boilerplate mining all start from this table).

    Scale: gram generation is map-only (array transform + explode); the
    groupBy benefits from map-side partial aggregation, so the shuffle
    carries one row per distinct gram per partition, not per occurrence.
    ``n_docs`` is an exact distinct — a second partial-aggregated pass.
    Consumers wanting a top-k slice should sort+limit (TakeOrdered — no
    global sort materialization).
    """
    from go_streaming_spark.functions.dedup import word_shingles

    grams = word_shingles(df, id_col, text_col, n, distinct=False)
    return grams.groupBy(F.col("shingle").alias("gram")).agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("id").alias("n_docs"),
    )


def contamination_stats(
    test_df: DataFrame,
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Eval-set contamination MEASUREMENT (the n-gram overlap report of the
    GPT-3 / PaLM papers): for each TEST document, the fraction of its
    k-token grams appearing anywhere in the TRAINING corpus.  The
    companion to :func:`decontaminate` — that op removes, this one
    quantifies what leaked (per-doc, so thresholded reporting and
    "dirty-subset" eval splits both fall out).

    Emits (id, n_grams, n_hit, hit_rate); docs shorter than ``k`` tokens
    are absent (no grams to measure).

    Scale: the train side reduces to DISTINCT gram digests — a narrow
    reusable index (persist it per corpus snapshot like the MinHash band
    index); test grams left-semi-join it on the digest.  Shuffle width is
    digest-constant in ``k``; nothing quadratic.
    """
    from go_streaming_spark.functions.dedup import gram_digest_positions

    test_grams = gram_digest_positions(test_df, id_col, text_col, k)
    train_grams = gram_digest_positions(train_df, id_col, text_col, k).select(
        "gh"
    ).distinct()
    hits = (
        test_grams.join(train_grams, "gh", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = test_grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    return totals.join(hits, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        q6(
            F.coalesce("n_hit", F.lit(0)) / F.col("n_grams").cast("double")
        ).alias("hit_rate"),
    )


def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information →
    (gram, n_xy, pmi_r).

    PMI compares the bigram's observed rate against independence:
    ``p(x,y) / (p(x)·p(y)) = n_xy·N_tok² / (N_big·c_x·c_y)``.  Ranking by
    the raw ratio is order-equivalent to ranking by log-PMI and avoids
    ln() — whose last-ulp rounding differs between libms — so the
    q6-quantized ratio is bit-deterministic across engines (every factor
    is an exact integer count; the multiply/divide chain is one fixed
    left-associative double expression in both).

    Scale shape: two map-side-combined groupBys (bigrams, unigrams), two
    equi-joins of the min_count-filtered bigram table against the
    vocabulary (the filter lands BEFORE the joins, pruning the join input
    to frequent pairs), two 1-row broadcast scalars for the totals, and a
    TakeOrdered top-k.  Stopword keys are hot — AQE skew-join splits them;
    no pinned broadcasts (vocabulary grows with corpus size).
    """
    w = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    t = spread(df).select(w.alias("w"))
    uni = t.select(F.explode("w").alias("tok"))
    uc = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    nt = uni.agg(F.count(F.lit(1)).alias("nt"))
    bi = t.filter(F.size("w") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, size(w)-1),"
                   " i -> struct(w[i-1] AS w1, w[i] AS w2))")
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    nb = bi.agg(F.count(F.lit(1)).alias("nb"))
    j = (
        bc.filter(F.col("n_xy") >= min_count)
        .join(uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
    )
    pmi = F.expr(
        "floor((CAST(n_xy AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))"
        " / (CAST(nb AS DOUBLE) * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))"
        " * 1e6 + 0.5)/1e6"
    )
    return (
        j.select(F.concat_ws(" ", "w1", "w2").alias("gram"), "n_xy", pmi.alias("pmi_r"))
        .orderBy(F.col("pmi_r").desc(), "gram")
        .limit(k)
    )


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply an ordered BPE merge list (from :func:`bpe_learn_merges`, or
    any trained tokenizer's rules) to the corpus and report per-document
    token statistics: (id, n_words, n_pieces).  Docs with no words don't
    appear (nothing to encode).

    The vocabulary formulation again: the corpus is touched once for
    per-doc word counts; the greedy merge fold (rank order, left-to-right
    with skip-after-merge — same canonical semantics as the trainer) runs
    ONCE per distinct word via an Arrow-batched UDF, and piece counts
    join back to the per-doc counts.  At 100 TB the distinct-word
    vocabulary is millions of rows where the corpus is trillions of
    tokens — the encode cost is amortized across every occurrence.  The
    vocabulary join deliberately carries no broadcast hint (it grows
    with the corpus; AQE decides).
    """
    import pandas as pd  # noqa: F401  (pandas_udf runtime dep)
    from pyspark.sql.functions import pandas_udf

    rules = [(str(a), str(b)) for a, b in merges]

    wc = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(words_expr(F.col(text_col))).alias("word"),
        )
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    @pandas_udf("int")
    def n_pieces(words):
        cache: dict[str, int] = {}

        def enc(w: str) -> int:
            hit = cache.get(w)
            if hit is not None:
                return hit
            syms = list(w)
            for a, b in rules:
                out, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            cache[w] = len(syms)
            return cache[w]

        return words.map(enc)

    enc = wc.select("word").distinct().withColumn("pieces", n_pieces("word"))
    return (
        wc.join(enc, "word")
        .groupBy("id")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("pieces")).cast("long").alias("n_pieces"),
        )
    )


def token_tv_drift(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
) -> DataFrame:
    """Distribution drift per group: the total-variation distance between
    each group's token distribution and the whole-corpus distribution —
    the monitoring stat that catches a source going off the rails (a
    crawler feeding navigation boilerplate, a language flip, template
    spam) long before eval metrics move.

    TV(s) = ½ Σ_t |p_s(t) − p(t)| computed EXACTLY in integers:
    ½ Σ_t |c_{s,t}·N − c_t·N_s| / (N_s·N).  Tokens absent from a group
    contribute algebraically — Σ_{t∉s} c_t·N_s = (N − Σ_{t∈s} c_t)·N_s —
    so the join touches only (group, token) pairs that EXIST; no outer
    join over the full vocabulary.  Emits (group, n_tokens, tv_q6) with
    tv_q6 = the µ-quantized distance via exact integer floor division.

    Shuffles: one groupBy(group, token) with map-side combine, one
    groupBy(token) over its output for corpus counts, one equi-join on
    token (vocabulary grows with the corpus — deliberately unhinted),
    one groupBy(group).  Int64 bounds: c·N ≤ N² must stay under 2^63 —
    exact up to ~3e9 corpus tokens; beyond that, pre-quantize
    frequencies to per-million units (same output grid).
    """
    toks = spread(df).select(
        F.col(group_col).alias("grp"),
        F.explode(words_expr(F.col(text_col))).alias("tok"),
    )
    # materialized once: four consumers with different pruned columns
    # defeat ReuseExchange, and each would otherwise re-tokenize the
    # corpus (see stats.categorical_tv_drift)
    gt = (
        toks.groupBy("grp", "tok")
        .agg(F.count(F.lit(1)).alias("c_gt"))
        .localCheckpoint()
    )
    ct = gt.groupBy("tok").agg(F.sum("c_gt").alias("c_t"))
    totals = gt.groupBy("grp").agg(F.sum("c_gt").alias("n_g"))
    n_all = gt.agg(F.sum("c_gt").alias("n_all"))
    per_tok = (
        gt.join(ct, "tok")
        .crossJoin(F.broadcast(n_all))  # 1-row scalar
        .join(totals, "grp")
        .groupBy("grp")
        .agg(
            F.first("n_g").alias("n_g"),
            F.first("n_all").alias("n_all"),
            F.sum(F.abs(F.col("c_gt") * F.col("n_all") - F.col("c_t") * F.col("n_g")))
            .alias("sum_abs_present"),
            F.sum(F.col("c_t")).alias("ct_present"),
        )
    )
    return per_tok.selectExpr(
        "grp AS " + group_col,
        "n_g AS n_tokens",
        # ½·(Σ_present |…| + (N − Σ_present c_t)·N_g) / (N_g·N), µ-quantized:
        # numerator and denominator exact int64, one floor division
        "(sum_abs_present + (n_all - ct_present) * n_g) * 1000000"
        " div (2 * n_g * n_all) AS tv_q6",
    )


def mixed_language_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Detect documents whose halves disagree on language — the cheap
    mixed-language screen (concatenated boilerplate, code-switched spam,
    mis-merged crawl records) that a whole-document argmax hides: a doc
    that is half English half German still gets a confident single
    label from :func:`lang_id`.

    Splits on the word midpoint (head = first ⌊n/2⌋ words, tail = the
    rest), runs the same marker-argmax on each half, and flags
    disagreement.  Docs with fewer than 2 words don't appear (nothing
    to split).  Emits (id, lang_head, lang_tail, mixed).

    Map-only: one scan, the split is array slicing, both argmaxes are
    the CASE cascade — no shuffle, no UDF.
    """
    words = words_expr(F.col(text_col))
    n = F.size(words)
    half = F.greatest((n / 2).cast("int"), F.lit(1))
    head = F.concat_ws(" ", F.slice(words, 1, half))
    tail = F.concat_ws(" ", F.slice(words, half + 1, n - half))
    lh = lang_id(head)
    lt = lang_id(tail)
    return (
        spread(df)
        .filter(n >= 2)
        .select(
            F.col(id_col).alias("id"),
            lh.alias("lang_head"),
            lt.alias("lang_tail"),
            (lh != lt).cast("int").alias("mixed"),
        )
    )


def compression_ratio(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap signal for
    templated/repetitive text (highly compressible → boilerplate, spam,
    generated filler) and for binary-ish noise (incompressible past
    ~1.0).  Complements :func:`repetition_ratio` (which sees only
    adjacent-bigram repeats) with whole-document redundancy.

    Emits (id, n_bytes, c_bytes, ratio_q) with
    ``ratio_q = floor(10⁶·c_bytes / n_bytes)`` (empty docs → NULL).
    Arrow-batched pandas UDF over the text column — zlib is stdlib, CPU
    ∝ bytes, embarrassingly parallel, no shuffle.  Deterministic for a
    fixed zlib build+level (partition-stability tested); no SQL oracle —
    exactness is pinned by a direct-zlib parity test, the BPE pattern.
    """
    import pandas as pd  # noqa: F401  (pandas_udf runtime dep)
    from pyspark.sql.functions import pandas_udf

    lvl = int(level)

    @pandas_udf("long")
    def c_len(texts):
        import zlib

        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), lvl))
            if t is not None
            else None
        )

    t = F.col(text_col)
    out = spread(df).select(
        F.col(id_col).alias("id"),
        F.length(t.cast("binary")).cast("long").alias("n_bytes"),
        c_len(t).alias("c_bytes"),
    )
    return out.selectExpr(
        "id", "n_bytes", "c_bytes",
        "CASE WHEN n_bytes > 0 THEN (c_bytes * 1000000) div n_bytes"
        " ELSE NULL END AS ratio_q",
    )


def compression_bounds_audit(
    df: DataFrame, id_col: str, text_col: str, level: int = 6
) -> DataFrame:
    """Gate-checkable twin of :func:`compression_ratio`: runs the same
    zlib pass but emits the invariants a SQL oracle CAN derive —
    (id, n_bytes, bounds_ok) where ``bounds_ok`` asserts the compressed
    length lands inside zlib's published guarantees:

    * lower: ``c_bytes ≥ max(9, n_bytes div 1100)`` — a non-empty zlib
      stream is ≥ 9 bytes (2-byte header + minimal deflate block +
      4-byte Adler-32), and deflate's maximum compression ratio is
      1032:1 (258-byte matches at ~2 bits/symbol), so n/1100 is a
      strict floor with margin;
    * upper: ``c_bytes ≤ n_bytes + n_bytes div 1000 + 64`` — a loose
      cover of ``compressBound`` (stored-block worst case
      n + 5·⌈n/16383⌉ + 6).

    The oracle emits the literal expected flag (1 for every non-empty
    doc), so any zlib mis-wiring that lands outside the bounds — wrong
    column, truncated bytes, double compression — hash-mismatches and
    reds the gate.  The exact ``c_bytes`` values stay pinned by the
    direct-zlib parity test (test_compression_ratio_matches_direct_zlib);
    this is the derived-invariant oracle pattern for ops whose kernel
    (zlib) the oracle engine does not have.  Empty docs → NULL both
    sides.
    """
    cr = compression_ratio(df, id_col, text_col, level)
    return cr.selectExpr(
        "id",
        "n_bytes",
        "CASE WHEN n_bytes > 0 THEN CAST(c_bytes BETWEEN"
        " greatest(9, n_bytes div 1100)"
        " AND n_bytes + (n_bytes div 1000) + 64 AS INT)"
        " ELSE NULL END AS bounds_ok",
    )


def hashed_bucket_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    seed: str = "probe",
) -> DataFrame:
    """Per-document hashed bag-of-words feature vector: every token
    OCCURRENCE hashes into one of ``k`` buckets (the hashing trick,
    Weinberger et al. 2009) and the features are the exact int64 bucket
    counts — the INPUT side of linear-probe training, pairing with
    :func:`hashed_linear_score` (the serving side).

    Emits (id, f0..f{k-1}, n_tokens).  Pure projection: the token array
    and its bucket array bind to real columns FIRST (the repo's
    nested-HOF rule — an unbound array re-evaluates per element), then
    each feature is one ``size(filter(...))`` over the bound bucket
    array — zero shuffles, zero joins, whole-stage codegen end to end,
    CPU ∝ tokens·1 (the md5 is computed once per token, not once per
    bucket).
    """
    from go_streaming_spark.functions.dedup import md5_int
    from go_streaming_spark.functions.util import spread

    bound = spread(df).select(
        F.col(id_col).alias("id"),
        words_expr(F.lower(F.col(text_col))).alias("__toks"),
    ).withColumn(
        "__b",
        F.transform(
            F.col("__toks"),
            lambda t: md5_int(F.concat_ws("|", F.lit(seed), t), 8) % k,
        ),
    )
    feats = [
        F.size(F.filter(F.col("__b"), lambda b: b == i)).cast("long").alias(f"f{i}")
        for i in range(k)
    ]
    return bound.select(
        "id", *feats, F.size("__toks").cast("long").alias("n_tokens")
    )


def hashed_bucket_entries(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 1024,
    seed: str = "probe",
) -> DataFrame:
    """Sparse twin of :func:`hashed_bucket_features` for REALISTIC probe
    widths: the same hashing-trick bucket counts (same md5 idiom, same
    seed → identical features), emitted as the row's NONZERO entries
    ``array<struct<i: long, x: long>>`` sorted by ``i`` instead of k
    wide columns — the input shape ``stats.gram_matrix_exploded``
    consumes.  At k≈1024 the wide form plans k count expressions per
    row (O(tokens·k) CPU) and the downstream literal gram agg blows
    codegen; this form is O(tokens·distinct_buckets) per row, still
    pure whole-stage-codegen projection — zero shuffles, zero joins.

    Emits (id, entries, n_tokens).

    Counting is a sorted RUN-LENGTH scan, not a per-distinct-bucket
    filter-count: sort the bucket array once (O(tokens·log tokens)),
    mark run starts positionally, and each entry's count is the gap to
    the next start — O(1) indexed ``get`` on BOUND columns (the repo's
    nested-HOF rule: an index lambda referencing an unmaterialized
    array expression re-evaluates it per element).  The previous form
    ran one ``size(filter(...))`` pass over the whole token-bucket
    array per DISTINCT bucket — O(distinct·tokens) ≈ 10M comparisons
    per 10k-token document at k=1024, the hot inner loop of the
    realistic-width training path.
    """
    from go_streaming_spark.functions.dedup import md5_int
    from go_streaming_spark.functions.util import spread

    empty = F.array().cast("array<struct<i: long, x: long>>")
    bound = spread(df).select(
        F.col(id_col).alias("id"),
        words_expr(F.lower(F.col(text_col))).alias("__toks"),
    ).withColumn(
        "__b",
        F.array_sort(
            F.transform(
                F.col("__toks"),
                lambda t: md5_int(F.concat_ws("|", F.lit(seed), t), 8) % k,
            )
        ),
    )
    s = F.col("__b")
    n = F.size(s)
    # positions where a new run of equal buckets begins (0-based get:
    # out-of-range/negative reads are NULL, and NULL != x is NULL-falsy,
    # so only the p == 0 arm admits the first element)
    bound = bound.withColumn(
        "__starts",
        F.filter(
            F.sequence(F.lit(0), n - 1),
            lambda p: (p == F.lit(0)) | (F.get(s, p) != F.get(s, p - 1)),
        ),
    )
    entries = F.transform(
        F.col("__starts"),
        lambda p, j: F.struct(
            F.get(s, p).cast("long").alias("i"),
            (F.coalesce(F.get(F.col("__starts"), j + 1), n) - p)
            .cast("long")
            .alias("x"),
        ),
    )
    return bound.select(
        "id",
        # n == 0 guard: sequence(0, -1) DESCENDS in Spark (it is not
        # empty), which would fabricate a NULL-bucket entry; NULL token
        # arrays propagate NULL through n as before
        F.when(n == F.lit(0), empty).otherwise(entries).alias("entries"),
        F.size("__toks").cast("long").alias("n_tokens"),
    )
