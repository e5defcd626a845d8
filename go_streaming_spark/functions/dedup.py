"""Deduplication operators for large-scale training-data pipelines.

Five families, all expressed as native DataFrame ops (no Python in the hot
path), each designed for the 100 TB case:

- **exact**: hash-groupBy on content digest — one shuffle on the digest.
- **n-gram Jaccard**: shingle → inverted-index self-join → pair agg.  The
  shuffle key is the shingle; hot (stopword-like) shingles are skew — the
  ``max_shingle_freq`` cap (a shingle shared by >N docs contributes
  candidate pairs quadratically while carrying almost no signal) is ON
  by default since r10 (:data:`DEFAULT_MAX_SHINGLE_FREQ`; pass ``None``
  to opt out on small corpora).
- **MinHash + LSH**: k deterministic universal hashes over 32-bit shingle
  digests, banded; candidate pairs only where a band bucket collides —
  turns the quadratic pair space into per-bucket mini cross products.
- **SimHash**: 60-bit signature; near-dup = small Hamming distance.  Pair
  generation uses pigeonhole blocking (split signature into d+1 chunks; a
  pair within distance d must agree on ≥1 chunk) instead of a cross join.
- **embedding cosine**: exact near-dup by cosine ≥ t; blocked variant via
  SimHash-of-embedding-signs for scale.

All hash math is int64-exact and engine-portable (md5-prefix → integer),
so every operator here has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_streaming_spark.functions.util import q6, spread

# Cache entries created by the CONVENIENCE (index=None) paths, keyed by the
# semantic hash of the cached plan.  Identical plans share one Spark storage
# entry (re-running the same query grows nothing), but one-shot calls over
# DISTINCT corpora in a long-lived session each add an entry — this registry
# bounds that accumulation by unpersisting the least-recently-used entries
# beyond the cap (advisor-caught r6).  Loop call sites pass ``index=`` and
# never touch this.
_CONVENIENCE_CACHES: OrderedDict[int, list[DataFrame]] = OrderedDict()
_CONVENIENCE_CACHE_MAX = 8


def _register_convenience_cache(key_df: DataFrame, frames: list[DataFrame]) -> None:
    key = key_df.semanticHash()
    if key in _CONVENIENCE_CACHES:
        _CONVENIENCE_CACHES.move_to_end(key)
        return
    _CONVENIENCE_CACHES[key] = frames
    while len(_CONVENIENCE_CACHES) > _CONVENIENCE_CACHE_MAX:
        _, oldest = _CONVENIENCE_CACHES.popitem(last=False)
        for f in oldest:
            f.unpersist()


def release_convenience_caches() -> None:
    """Unpersist every cache entry the convenience (``index=None``) dedup
    paths created in this session — call when switching corpora for good."""
    while _CONVENIENCE_CACHES:
        _, frames = _CONVENIENCE_CACHES.popitem(last=False)
        for f in frames:
            f.unpersist()

# Universal-hash parameters: h_j(x) = (A[j]*x + B[j]) mod P over 32-bit x.
# P = 2^31 - 1 (prime); A < 2^30 keeps A*x < 2^62 — no int64 overflow.
MINHASH_P = 2_147_483_647
MINHASH_A = [
    387420489, 536870923, 715827883, 129140163, 268435459, 402653189,
    94906249, 805306457, 159432871, 673720361, 33554467, 987654323,
    246813579, 864197531, 573214271, 111111113,
]
MINHASH_B = [
    12345, 987654321, 192837465, 1029384756, 555555555, 246801357,
    1122334455, 998877665, 443322110, 1357924680, 86420246, 975318642,
    13571113, 864208642, 111213141, 515253545,
]


def md5_int(col: Column, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative int64.

    8 chars = 32 bits (minhash base), 15 chars = 60 bits (simhash).
    Portable: DuckDB computes the identical value via
    ``CAST('0x' || substr(md5(x),1,n) AS BIGINT)``.
    """
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per document → (id, shingle).

    The split+explode stage is the CPU-heavy part of every shingle-based
    dedup — ``spread`` guarantees it parallelizes even when the input
    arrives as a single small file split.

    ``distinct=True`` dedupes shingles per doc (required for Jaccard set
    counting: one shuffle).  Pass ``distinct=False`` when the consumer is
    duplicate-insensitive (minhash min-aggregation) — skipping the dedup
    shuffle halves the passes over the shingle stream.
    """
    df = spread(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    if n == 1:
        out = df.select(F.col(id_col).alias("id"), F.explode(words).alias("shingle"))
    else:
        # BIND the word array before windowing: a lambda that references
        # the unmaterialized split expression re-evaluates it per element
        # (O(words²) per doc — measured 14× on 1k-word docs, and the
        # factor grows with doc length); a bound column is read, not
        # recomputed
        bound = df.filter(F.size(words) >= n).select(
            F.col(id_col).alias("id"), words.alias("__w")
        )
        # shingle i = words[i..i+n): transform over valid start positions
        grams = F.transform(
            F.sequence(F.lit(0), F.size(F.col("__w")) - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("__w"), i + 1, n)),
        )
        out = bound.select("id", F.explode(grams).alias("shingle"))
    return out.distinct() if distinct else out


def exact_dedup(df: DataFrame, id_col: str, content_cols: list[str]) -> DataFrame:
    """Exact dedup: digest → keep the lowest id, count copies.

    Scale: single shuffle on the digest; AQE handles the (rare) giant
    duplicate group.  The digest keeps the shuffle row narrow even when the
    content is megabytes.
    """
    digest = F.md5(F.concat_ws("", *content_cols))
    return df.groupBy(digest.alias("content_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Incremental exact dedup: from a NEW batch, keep only documents whose
    content digest is (a) unseen in the existing CORPUS and (b) unique
    within the batch (lowest id wins) — the recurring-crawl ingestion step:
    dedup the delta against the accumulated corpus without re-deduping the
    corpus.

    Scale: both sides project to 16-byte digests before the LEFT ANTI join,
    so the shuffle moves digests, not documents — at 100 TB the corpus side
    is a digest index, not the corpus.  The anti-join and the in-batch
    groupBy share the digest key, so AQE plans one exchange per side.
    """
    digest = F.md5(F.concat_ws("", *content_cols))
    batch = (
        new_df.withColumn("content_hash", digest)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    seen = corpus_df.select(digest.alias("content_hash")).distinct()
    return batch.join(seen, "content_hash", "left_anti")


def incremental_exact_dedup_bloom(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    content_cols: list[str],
    k: int = 4,
    m_bits: int = 65_536,
) -> DataFrame:
    """Bloom-prefiltered incremental exact dedup — output ≡
    :func:`incremental_exact_dedup` (same digest, same keep-lowest-id
    rule); the filter changes only the COST:

    The corpus reduces to a fixed-size (word, bits) Bloom filter
    (``ceil(m_bits/60)`` longs regardless of corpus size, mergeable by
    bit_or — the set-membership sibling of the CMS).  Batch digest groups
    test membership MAP-SIDE against the driver-collected filter; a Bloom
    filter has NO false negatives, so 'not in filter' rows are definitely
    new and skip the anti-join entirely — at 100 TB the overwhelmingly-new
    crawl mass never shuffles against the corpus.  Only maybe-seen digests
    (true dups + the ~(1-e^-kn/m)^k false-positive sliver) reach the exact
    digest anti-join that makes the result exact.
    """
    from go_streaming_spark.functions import sketch as sk

    digest = F.md5(F.concat_ws("", *content_cols))
    batch = (
        new_df.withColumn("content_hash", digest)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )
    corpus_dig = corpus_df.select(digest.alias("content_hash"))
    bloom = sk.bloom_build(corpus_dig, "content_hash", k, m_bits)
    maybe = sk.bloom_maybe_contains(bloom, F.col("content_hash"), k, m_bits)
    fresh = batch.filter(~maybe)
    verified = batch.filter(maybe).join(
        corpus_dig.distinct(), "content_hash", "left_anti"
    )
    return fresh.unionByName(verified)


def jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact TOKEN-SET Jaccard pairs ≥ ``threshold`` via PREFIX FILTERING
    (the PPJoin family: Chaudhuri et al. 2006, Xiao et al. 2008) — the
    provably-exact alternative to LSH candidate generation.

    Order each doc's distinct tokens by ascending global document
    frequency (rarest first, ties by token); two sets whose first
    ``s - floor(t*s) + 1`` tokens (one longer than the canonical
    ``s - ceil(t*s) + 1`` — floor sidesteps float-boundary ceil flips and
    can only widen the prefix, preserving soundness) are DISJOINT cannot
    reach Jaccard ``t`` — so the inverted-index self-join runs over prefix
    tokens only, and rare tokens generate almost no pairs.  Exact-Jaccard
    verification then touches candidates only.

    Scale: the candidate join shuffles prefix tokens (a vanishing fraction
    of all tokens at high thresholds), and the global frequency table is a
    one-pass groupBy — no signatures, no probability of a missed pair.
    Emits (id_a < id_b, n_common, jaccard ≥ t), identical to the
    brute-force token-set result.
    """
    from pyspark.sql.window import Window

    toks = (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.col(text_col), r"\s+"), lambda w: w != ""
                    )
                )
            ).alias("token"),
        )
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(dfreq, "token")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df", "token")
            ),
        )
        .join(sizes, "id")
        .filter(
            F.col("rnk")
            <= F.col("n_tok") - F.floor(F.lit(threshold) * F.col("n_tok")) + 1
        )
        .select("id", "token")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(b, "token")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ta = toks.select(F.col("id").alias("id_a"), "token")
    tb = toks.select(F.col("id").alias("id_b"), "token")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


class MinHashIndex(NamedTuple):
    """Persisted corpus-side state for incremental near-dup ingestion.

    ``bands``: (id, band, band_key) — the LSH index, ~k/r narrow rows per
    corpus doc.  ``shingles``: (id, shingles array<string>) — the per-doc
    shingle sets the exact-Jaccard verification joins against.  Both are
    per-doc properties, so in production they are computed ONCE per corpus
    snapshot (stored as parquet / cached), and every ingest batch joins
    them — never re-shingling the corpus (the reference's recurring-crawl
    shape; cf. subscribe-once semantics in
    /root/reference/pkg/pubsub/stream.go).

    The caller owns the lifecycle: ``index.cache()`` before a batch loop,
    ``index.unpersist()`` after — nothing in this module caches behind the
    caller's back (a per-call cache in a ``foreachBatch`` loop grows
    executor storage unboundedly).
    """

    bands: DataFrame
    shingles: DataFrame
    n: int
    k: int
    rows_per_band: int

    def cache(self) -> "MinHashIndex":
        self.bands.cache()
        self.shingles.cache()
        return self

    def unpersist(self) -> "MinHashIndex":
        self.bands.unpersist()
        self.shingles.unpersist()
        return self

    def save(self, path: str) -> None:
        """Persist the index as parquet (bands/, shingles/, params/) — the
        production corpus-snapshot artifact: build once per snapshot, every
        later ingest batch loads and joins it without re-shingling a byte
        of the corpus.  Parquet keeps the band rows columnar/splittable, so
        the load-side join parallelizes like any table scan."""
        self.bands.write.mode("overwrite").parquet(f"{path}/bands")
        self.shingles.write.mode("overwrite").parquet(f"{path}/shingles")
        spark = self.bands.sparkSession
        spark.createDataFrame(
            [(self.n, self.k, self.rows_per_band)],
            "n int, k int, rows_per_band int",
        ).write.mode("overwrite").parquet(f"{path}/params")

    @staticmethod
    def load(spark, path: str) -> "MinHashIndex":
        """Load an index written by :meth:`save`."""
        p = spark.read.parquet(f"{path}/params").head()
        return MinHashIndex(
            spark.read.parquet(f"{path}/bands"),
            spark.read.parquet(f"{path}/shingles"),
            int(p.n), int(p.k), int(p.rows_per_band),
        )

    def save_bucketed(
        self,
        table_prefix: str,
        n_buckets: int | None = None,
        path: str | None = None,
    ) -> None:
        """Persist the index as BUCKETED catalog tables —
        ``{prefix}_bands`` bucketed AND sorted by ``(band, band_key)``,
        ``{prefix}_shingles`` bucketed by ``(id)``, ``{prefix}_params``
        plain — so every later ingest batch's candidate join
        (:func:`dedup_against_index` joins on ``(band, band_key)``)
        plans with **no corpus-side Exchange**: the batch side alone
        shuffles to ``n_buckets``, while the corpus-scale band index is
        read in place, pre-sorted for the merge.  At corpus ≫ batch —
        the recurring-crawl steady state — re-shuffling the index every
        batch is THE dominant ingest cost the plain-parquet :meth:`save`
        pays and this layout retires (plan-asserted in
        test_plans.py::test_bucketed_index_ingest_join_no_index_exchange).

        ``n_buckets`` defaults to the session's shuffle partitions; pick
        it like a shuffle-partition count for the CORPUS size (buckets
        are the join's parallelism ceiling).  ``path`` makes the tables
        external (snapshot artifact on shared storage).  Load with
        :meth:`load_bucketed` — a path-level parquet read would drop the
        bucket spec and silently reintroduce the exchange.
        """
        from go_streaming_spark.functions.util import (
            default_buckets,
            run_concurrent,
        )
        from go_streaming_spark.sources.formats import write_bucketed

        spark = self.bands.sparkSession
        nb = n_buckets or default_buckets(spark)

        def _params():
            w = spark.createDataFrame(
                [(self.n, self.k, self.rows_per_band)],
                "n int, k int, rows_per_band int",
            ).write.mode("overwrite")
            if path:
                w = w.option("path", f"{path}/params")
            w.saveAsTable(f"{table_prefix}_params")

        # the three tables share no dependency — overlap their write jobs
        # (guide §2.6); sequential, each paid its own scheduling tail
        run_concurrent([
            lambda: write_bucketed(
                self.bands, f"{table_prefix}_bands",
                ["band", "band_key"], nb,
                sort_cols=["band", "band_key"],
                path=f"{path}/bands" if path else None,
            ),
            lambda: write_bucketed(
                self.shingles, f"{table_prefix}_shingles", ["id"], nb,
                sort_cols=["id"],
                path=f"{path}/shingles" if path else None,
            ),
            _params,
        ])

    @staticmethod
    def load_bucketed(spark, table_prefix: str) -> "MinHashIndex":
        """Load an index written by :meth:`save_bucketed` (catalog reads —
        the bucket spec lives in the table definitions)."""
        p = spark.table(f"{table_prefix}_params").head()
        return MinHashIndex(
            spark.table(f"{table_prefix}_bands"),
            spark.table(f"{table_prefix}_shingles"),
            int(p.n), int(p.k), int(p.rows_per_band),
        )


def build_minhash_index(
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> MinHashIndex:
    """Build the corpus-side :class:`MinHashIndex` for
    :func:`dedup_against_index`.  ``max_bucket_size`` caps corpus-side
    band buckets (boilerplate floods) at index-build time, so every batch
    that joins the index inherits the cap for free.

    Lazy frames — call ``.cache()`` (or write both frames to parquet and
    read them back) before joining repeated batches against it.
    """
    sh = shingle_arrays(corpus_df, id_col, text_col, n)
    sig = minhash_signatures_wide(corpus_df, id_col, text_col, n, k, shingles=sh)
    bands = band_keys(sig, k, rows_per_band, max_bucket_size)
    return MinHashIndex(bands, sh, n, k, rows_per_band)


def dedup_against_index(
    new_df: DataFrame,
    index: MinHashIndex,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    _cache_batch_shingles: bool = False,
    _return_parts: bool = False,
) -> DataFrame:
    """Drop NEW-batch documents with an exact-Jaccard match ≥ ``threshold``
    among their MinHash-LSH candidates in a prebuilt corpus
    :class:`MinHashIndex` — the production shape of incremental near-dup
    ingestion: the index is computed once per corpus snapshot, each batch
    equi-joins it on (band, band_key).

    Cost ∝ batch size + bucket collisions, never corpus pairs; the corpus
    contributes only index rows (bands) and the shingle sets of candidate
    ids (verification join).  Emits surviving batch rows unchanged.
    In-batch duplicates are NOT resolved here — see
    :func:`incremental_minhash_dedup_full`.  Ids must be unique ACROSS
    batch and corpus: a shared id would collide in the verification
    shingle union.

    Physical shape (guide §3.1/§8): the BATCH is the bounded side of this
    op by contract (a crawl micro-batch vs the accumulated corpus), so by
    default every batch-derived frame — band keys, candidate pairs with
    their batch shingles, flagged ids — is BROADCAST and the corpus-scale
    frames (``index.bands``, ``index.shingles``) are only ever scanned in
    place, map-side: the corpus never shuffles, at any corpus size.
    ``GS_INGEST_BROADCAST=0`` (or a streaming batch, which cannot build a
    broadcast) falls back to the shuffle-join plan — use it when batches
    are NOT bounded (broadcasting a multi-GB batch risks driver/executor
    memory; guide §3.1's sizing caveats apply to the batch here).
    """
    import os

    n, k, rows_per_band = index.n, index.k, index.rows_per_band
    bcast = (
        not new_df.isStreaming
        and os.environ.get("GS_INGEST_BROADCAST") != "0"
    )
    sh_new = shingle_arrays(new_df, id_col, text_col, n)
    # the batch shingles feed the signature AND the verification join;
    # the one-shot convenience wrapper asks for a cache (identical plans
    # share one entry, so re-runs stay bounded) — ingestion LOOPS get a
    # per-plan localCheckpoint instead: it materializes the batch-sized
    # frame once for both consumers without the unbounded cache-registry
    # growth a per-micro-batch .cache() would cause (each batch is a new
    # plan; blocks are released with the plan)
    if _cache_batch_shingles and not new_df.isStreaming:
        sh_new = sh_new.cache()
        _register_convenience_cache(sh_new, [sh_new])
    elif not new_df.isStreaming:
        sh_new = sh_new.localCheckpoint()
    sig_new = minhash_signatures_wide(new_df, id_col, text_col, n, k, shingles=sh_new)
    bands_new = band_keys(sig_new, k, rows_per_band)
    if _return_parts and not new_df.isStreaming:
        # a caller will REUSE the batch band keys (see
        # incremental_minhash_dedup_full's in-batch stage): materialize
        # them once — batch-bounded narrow rows (k/r per doc) — so the
        # 16-minhash signature pass runs once, not once per consumer
        bands_new = bands_new.localCheckpoint()
    a = bands_new.select(
        F.col("id").alias("id_a"), "band", "band_key"
    )
    if bcast:
        # broadcast the batch bands into the corpus band index: the
        # candidate join is a map-side hash join over the index scan —
        # no exchange on EITHER side (the batch side folds into the
        # broadcast build)
        a = F.broadcast(a)
    b = index.bands.select(F.col("id").alias("id_b"), "band", "band_key")
    candidates = (
        a.join(b, ["band", "band_key"])
        .select("id_a", "id_b")
        .distinct()
    )
    # pair-oriented exact verification, ASYMMETRIC by construction:
    # id_a comes from the batch's bands, id_b from the corpus index's —
    # joining each side against only its own shingle frame executes the
    # corpus shingle source ONCE (the previous batch∪corpus union ran it
    # once per join side: 2× the corpus shingle work per ingest batch,
    # whether computed fresh or scanned from a snapshot table); on the
    # broadcast path the (pairs ⋈ batch-shingles) relation — bounded by
    # batch × capped bucket collisions — additionally broadcasts into the
    # corpus shingle scan, so verification is map-only too
    verified = jaccard_verify_pairs(
        candidates, None, id_col, text_col, n,
        shingles=sh_new, shingles_b=index.shingles,
        broadcast_pairs=bcast,
    )
    flagged = (
        verified.filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    if bcast:
        # flagged ⊆ batch ids: broadcast it so the final anti-join never
        # shuffles the batch either
        flagged = F.broadcast(flagged)
    out = new_df.join(flagged, id_col, "left_anti")
    if _return_parts:
        return out, sh_new, bands_new
    return out


def incremental_minhash_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    index: MinHashIndex | None = None,
    _return_parts: bool = False,
) -> DataFrame:
    """Incremental NEAR-dup dedup: from a NEW batch, keep only documents
    with no exact-Jaccard match ≥ ``threshold`` among their MinHash-LSH
    candidates in the accumulated CORPUS — the near-dup companion to
    :func:`incremental_exact_dedup` for recurring-crawl ingestion
    (re-crawls and boilerplate variants are near-dups, not byte dups).

    Semantics mirror :func:`minhash_lsh_pairs` restricted to batch×corpus
    pairs (see :func:`dedup_against_index` for the join shape and the
    id-uniqueness precondition).

    Pass ``index=`` (a prebuilt, caller-cached :class:`MinHashIndex`) for
    repeated ingestion — e.g. a ``foreachBatch`` loop — so the corpus is
    shingled once, not once per batch; ``corpus_df`` is then ignored and
    NOTHING is cached behind the caller's back (each micro-batch is a new
    plan; per-call cache entries would accumulate in executor storage).

    The convenience path (``index=None``) is the ONE-SHOT shape: it caches
    the index frames and the batch shingles, since each feeds two
    consumers (signature + verification) and would otherwise be computed
    twice.  Identical plans share a single cache entry (re-running the
    same query grows nothing) and DISTINCT corpora are bounded by the
    module's LRU registry (oldest entries unpersist beyond the cap; see
    :func:`release_convenience_caches` to drop them all eagerly) — still,
    prefer ``index=`` inside ingestion loops: it also skips re-shingling
    the corpus every batch.
    """
    if index is None:
        index = build_minhash_index(
            corpus_df, id_col, text_col, n, k, rows_per_band, max_bucket_size
        )
        if not corpus_df.isStreaming:
            index.cache()
            _register_convenience_cache(
                index.bands, [index.bands, index.shingles]
            )
        return dedup_against_index(
            new_df, index, id_col, text_col, threshold,
            _cache_batch_shingles=True, _return_parts=_return_parts,
        )
    return dedup_against_index(
        new_df, index, id_col, text_col, threshold,
        _return_parts=_return_parts,
    )


def incremental_minhash_dedup_full(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    index: MinHashIndex | None = None,
) -> DataFrame:
    """FULL incremental near-dup ingestion: batch-vs-corpus AND
    batch-vs-batch in one op, so an ingest batch leaves fully
    near-dup-free.

    Stage 1 drops batch docs near-duplicating the corpus
    (:func:`incremental_minhash_dedup` — band-index join + exact-Jaccard
    verify).  Stage 2 resolves duplicates WITHIN the survivors: symmetric
    :func:`minhash_lsh_pairs` over the survivors, connected components of
    the verified pair graph, keep the minimum id per component (the same
    canonical-member rule as ``dedup_components``).

    Scale: stage 2's pair generation runs over the batch only (corpus
    never self-joins), and component resolution is the O(log d)
    label-propagation of :mod:`go_streaming_spark.functions.graph` — at
    100 TB the corpus contributes index rows, the batch contributes
    everything else.  Batch-only: stage 2's convergence loop runs driver
    actions, so wrap in ``foreachBatch`` for streaming ingestion.
    """
    from go_streaming_spark.functions.graph import dedup_components

    if new_df.isStreaming:
        # stage 2's convergence loop runs driver actions anyway (wrap in
        # foreachBatch); keep the self-contained shape for streaming frames
        survivors = incremental_minhash_dedup(
            new_df, corpus_df, id_col, text_col, n, k, rows_per_band,
            threshold, max_bucket_size, index=index,
        ).localCheckpoint()
        pairs = minhash_lsh_pairs(
            survivors, id_col, text_col, n, k, rows_per_band, threshold,
            max_bucket_size,
        )
        comps = dedup_components(pairs)
        drop = comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
        return survivors.join(drop, id_col, "left_anti")

    s1, sh_new, bands_new = incremental_minhash_dedup(
        new_df, corpus_df, id_col, text_col, n, k, rows_per_band,
        threshold, max_bucket_size, index=index, _return_parts=True,
    )
    survivors = s1.localCheckpoint()  # consumed ≥2× (pair gen + final
    # anti-join) and by the component loop's action rounds — materialize
    # the batch-vs-corpus stage once; batch-sized, so executor storage
    # cost is one batch
    # Stage 2 pair generation REUSES stage 1's batch shingle + band-key
    # frames (shingles and band keys are per-row properties of the same
    # text, so filtering them to the survivor ids ≡ recomputing them over
    # the survivors): re-shingling + re-minhashing the batch a second
    # time was the single biggest redundant compute in the ingest path
    # (guide §1.2 step 1: don't compute things twice).  All frames here
    # are batch-bounded — broadcast the survivor-id filters and one side
    # of the band self-join so stage 2 adds no wide exchange.
    ids = survivors.select(F.col(id_col).alias("id"))
    bands_s = bands_new.join(F.broadcast(ids), "id", "left_semi")
    if max_bucket_size:
        from pyspark.sql.window import Window

        wsz = Window.partitionBy("band", "band_key")
        bands_s = (
            bands_s.withColumn("_sz", F.count(F.lit(1)).over(wsz))
            .filter(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    sh_s = sh_new.join(F.broadcast(ids), "id", "left_semi")
    a, b = bands_s.alias("a"), bands_s.alias("b")
    candidates = (
        a.join(F.broadcast(b), ["band", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = jaccard_verify_pairs(
        candidates, None, id_col, text_col, n, shingles=sh_s
    ).filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")
    comps = dedup_components(pairs)
    drop = comps.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return survivors.join(drop, id_col, "left_anti")


def exact_dedup_stream(
    df: DataFrame,
    content_cols: list[str],
    time_col: str = "event_start",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop events whose content digest was already
    seen within the watermark horizon.

    Scale: ``dropDuplicatesWithinWatermark`` keys state by the digest and
    **evicts** entries older than the watermark — bounded state, unlike a
    plain ``dropDuplicates`` whose seen-set grows forever.  The digest keeps
    state entries constant-width regardless of content size.
    """
    digest = F.md5(F.concat_ws("", *content_cols))
    out = df.withColumn("content_hash", digest).withWatermark(time_col, watermark)
    return out.dropDuplicatesWithinWatermark(["content_hash"])


DEFAULT_MAX_SHINGLE_FREQ = 1000
"""Default hot-shingle cap for the inverted-index pair joins.

The shingle-bucket intersection is O(Σ freq²) per shingle — ONE
stopword-class n-gram shared by d docs contributes d² candidate pairs
landing on a single shuffle key, which at 100 TB is a single-key
explosion no cluster absorbs.  A shingle in >1000 docs carries no
dedup signal (it is boilerplate by definition), so the cap is on by
default; pass ``max_shingle_freq=None`` to opt OUT for small corpora
where the exact uncapped measure is wanted.  The DuckDB oracles mirror
the same frequency filter (queries_llm._SH_CAPPED).
"""


_WARNED_SHINGLE_CAP = False


DEFAULT_MAX_CANDIDATE_PAIRS = 10_000_000_000
"""Default candidate-pair budget for the EXACT n-gram pair joins.

The exact inverted-index self-join emits Σ_shingle C(freq, 2) candidate
rows before the pair aggregation — inherently superlinear in corpus
size (measured 5.7× work at 10× data, SCALE.md), which is fine at
document-collection scale and catastrophic at 100 TB.  The guard
estimates that mass from the shingle-frequency table (computed once for
the hot-shingle cap anyway) and refuses to launch the join above the
budget, pointing at :func:`minhash_lsh_pairs` — the subquadratic scale
path — instead.  Pass ``max_candidate_pairs=None`` to opt out (you are
promising the quadratic cost is intended).
"""


def _cap_and_guard(
    sh: DataFrame, cap: int | None, budget: int | None, op: str
) -> DataFrame:
    """Apply the hot-shingle cap and the candidate-pair budget from ONE
    shingle-frequency aggregation.

    ``freq`` (distinct shingles + counts — strictly smaller than the
    cached doc×shingle index feeding it) is persisted only long enough
    to derive the Σ C(freq,2) budget estimate and the hot set, then
    unpersisted — the full corpus-width frequency table never outlives
    this call (a leaked materialization per pair-join call is exactly
    the kind of state growth the guard exists to prevent).  Only the
    HOT set (shingles above the cap — boilerplate, a tiny set by
    construction) is localCheckpointed, because it feeds the anti-join
    on BOTH sides of the downstream self-join and its emptiness probe.

    Warns ONCE per process when the cap actually drops shingles, so
    small-corpus users notice the r10 default changed semantics and
    that ``max_shingle_freq=None`` opts out.
    """
    if cap is None and budget is None:
        return sh
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f")).persist()
    try:
        if budget is not None:
            kept = freq.filter(F.col("__f") <= cap) if cap else freq
            est = kept.agg(
                F.sum(
                    F.col("__f").cast("double") * (F.col("__f") - 1) / 2
                ).alias("p")
            ).first()["p"]
            if est and est > budget:
                raise ValueError(
                    f"{op}: exact n-gram pair join would emit ~{est:.3g}"
                    f" candidate pairs (> max_candidate_pairs={budget:,}) —"
                    " this exact all-pairs measure is inherently superlinear"
                    " and this corpus is past the budget.  Use"
                    " minhash_lsh_pairs (banded LSH, the subquadratic scale"
                    " path), tighten max_shingle_freq, or pass"
                    " max_candidate_pairs=None to accept the quadratic cost."
                )
        if not cap:
            return sh
        # eager localCheckpoint: materializes the small hot set NOW (while
        # freq is still persisted) and cuts its lineage, so the unpersist
        # below can never force a recompute of the full frequency table
        hot = freq.filter(F.col("__f") > cap).select("shingle").localCheckpoint()
    finally:
        freq.unpersist()
    global _WARNED_SHINGLE_CAP
    if not _WARNED_SHINGLE_CAP and not hot.isEmpty():
        _WARNED_SHINGLE_CAP = True
        import warnings

        warnings.warn(
            f"hot-shingle cap (max_shingle_freq={cap}, default since"
            " r10) is dropping shingles from this corpus — pairs"
            " sharing only capped shingles disappear and Jaccard/"
            "containment denominators shrink; pass"
            " max_shingle_freq=None for the exact uncapped measure"
            " (safe only on small corpora).",
            stacklevel=3,
        )
    return sh.join(hot, "shingle", "left_anti")


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    max_candidate_pairs: int | None = DEFAULT_MAX_CANDIDATE_PAIRS,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: (id_a < id_b, jaccard ≥ t).

    Inverted-index join: shuffle on the shingle, so each shingle's doc list
    meets in one partition; pair counts then aggregate on (id_a, id_b).
    ``max_shingle_freq`` drops degenerate hot shingles (skew + noise) —
    at 100 TB this bound is what keeps bucket cross products finite, so
    it is ON by default (:data:`DEFAULT_MAX_SHINGLE_FREQ`); capped
    shingles leave the universe entirely (the denominator too).

    SCALE WARNING: even capped, the exact measure is superlinear —
    candidate-pair mass is Σ C(freq, 2), measured 5.7× work at 10× data
    (SCALE.md).  ``max_candidate_pairs``
    (:data:`DEFAULT_MAX_CANDIDATE_PAIRS`) estimates that mass up front
    and raises rather than launch a join no cluster absorbs; the scale
    path for 100 TB corpora is :func:`minhash_lsh_pairs`.
    """
    sh = word_shingles(df, id_col, text_col, n).cache()
    _register_convenience_cache(sh, [sh])
    sh = _cap_and_guard(sh, max_shingle_freq, max_candidate_pairs, "jaccard_pairs")
    # sizes feeds TWO joins (sa/sb) — materialize once; the known
    # multi-consumer ReuseExchange miss would otherwise recompute the
    # whole shingle aggregation per consumer.  Doc-count-sized.
    sizes = (
        sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .localCheckpoint()
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "jaccard")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    max_candidate_pairs: int | None = DEFAULT_MAX_CANDIDATE_PAIRS,
) -> DataFrame:
    """DIRECTED n-gram containment pairs: (id_src, id_dst) with
    ``|sh(src) ∩ sh(dst)| / |sh(src)| ≥ t`` — "src's shingles are mostly
    inside dst".

    The asymmetric member of the near-dup family: symmetric Jaccard
    divides by the UNION, so a short document quoted wholesale inside a
    long one scores near zero and survives dedup — containment is how
    quote-inclusion, boilerplate-wrapping, and subset-page duplicates are
    actually caught (the measure behind CCNet/RefinedWeb-style subset
    filters).  Each unordered candidate pair emits up to two directed
    rows (each direction has its own denominator).

    Same inverted-index join + hot-shingle cap as :func:`jaccard_pairs`
    (one shingle shuffle, one pair aggregation; the cap is ON by
    default — :data:`DEFAULT_MAX_SHINGLE_FREQ`).  The directed fan-out
    is a per-row explode of a 2-element struct array AFTER the
    aggregation — ONE pass over the joined pairs, not a union of two
    projections (a union duplicates the whole join subtree in the plan
    when ReuseExchange misses; the explode shape cannot).  The
    containment value is a single exact-int division — bit-identical
    across engines without quantization, like jaccard.
    """
    sh = word_shingles(df, id_col, text_col, n).cache()
    _register_convenience_cache(sh, [sh])
    sh = _cap_and_guard(
        sh, max_shingle_freq, max_candidate_pairs, "containment_pairs"
    )
    # sizes feeds TWO joins (sa/sb): materialize once (ReuseExchange
    # misses multi-consumer aggregates).  Doc-count-sized.
    sizes = (
        sh.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
        .localCheckpoint()
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    joined = inter.join(sa, "id_a").join(sb, "id_b")
    both = joined.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id_src"),
                    F.col("id_b").alias("id_dst"),
                    F.col("n_common"),
                    (F.col("n_common") / F.col("n_a")).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("id_src"),
                    F.col("id_a").alias("id_dst"),
                    F.col("n_common"),
                    (F.col("n_common") / F.col("n_b")).alias("containment"),
                ),
            )
        ).alias("r")
    )
    return both.select("r.*").filter(F.col("containment") >= threshold)


def shingle_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingles array<string> distinct) — per-doc shingle set as one
    array column, computed map-side (no explode/shuffle)."""
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # BIND the word array before windowing (see word_shingles: an
    # unbound split inside the lambda re-evaluates per element, O(L²))
    bound = spread(df).select(F.col(id_col).alias("id"), words.alias("__w"))
    w = F.col("__w")
    if n == 1:
        arr = F.array_distinct(w)
    else:
        # guard: sequence(0, -1) DESCENDS in Spark (it is NOT empty), so a
        # doc with fewer than n words must short-circuit to an empty
        # shingle set explicitly (found by fuzz via dedup_components_star:
        # the descending index made slice(start=0) throw)
        starts = F.when(
            F.size(w) >= n, F.sequence(F.lit(0), F.size(w) - n)
        ).otherwise(F.array().cast("array<int>"))
        arr = F.array_distinct(
            F.transform(
                starts,
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            )
        )
    return bound.select("id", arr.alias("shingles"))


def jaccard_verify_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    shingles: DataFrame | None = None,
    shingles_b: DataFrame | None = None,
    broadcast_pairs: bool = False,
) -> DataFrame:
    """Exact Jaccard for an explicit candidate-pair set (id_a, id_b).

    Pair-oriented: each doc's distinct-shingle ARRAY is computed once
    map-side, the pair list joins it twice (2 equi-join shuffles), and the
    per-pair intersection is a JVM array op — no inverted-index self-join
    over the candidates' shingle streams.  This is the verification half of
    LSH at scale: cost ∝ |candidates|, not |docs with shared shingles|².

    ``shingles``: optionally pass a precomputed :func:`shingle_arrays` frame.
    ``shingles_b``: optionally a DIFFERENT shingle frame for the ``id_b``
    side — when the pair set is bipartite by construction (batch ids left,
    corpus ids right, as in :func:`dedup_against_index`), joining each side
    against only ITS shingle source avoids executing a batch∪corpus union
    twice; with one frame the union's corpus half was recomputed/re-scanned
    per side (2× the corpus shingle work per ingest batch).
    ``broadcast_pairs``: when the pair set AND the ``id_a`` shingle source
    are bounded (the ingest-batch contract), broadcast (pairs ⋈ _sa) into
    the ``id_b`` shingle scan so the big side never shuffles — same rows,
    different physical plan.
    """
    sh = shingles if shingles is not None else shingle_arrays(df, id_col, text_col, n)
    sh_b = shingles_b if shingles_b is not None else sh
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("_sa"))
    b = sh_b.select(F.col("id").alias("id_b"), F.col("shingles").alias("_sb"))
    if broadcast_pairs:
        # the pair set and the id_a shingle source are BOUNDED (batch-side
        # by contract): attach _sa inside the bounded subtree and broadcast
        # the (pair, _sa) relation into the id_b shingle scan — the big
        # (corpus) side is verified MAP-SIDE, zero corpus-side exchange
        # (guide §3.1 broadcast-the-side-that-fits / §8 decide-with-small-
        # rows).  Inner joins commute, so the result is identical to the
        # shuffle form.
        joined = b.join(F.broadcast(pairs.join(F.broadcast(a), "id_a")), "id_b")
    else:
        joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size("_sa") + F.size("_sb") - inter
    return joined.select(
        "id_a",
        "id_b",
        inter.alias("n_common"),
        (inter / union).alias("jaccard"),
    ).filter(F.col("n_common") > 0)


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    prefix_len: int = 80,
) -> DataFrame:
    """Near-dup pairs by bounded Levenshtein distance over a fixed-length
    text prefix: (id_a < id_b, dist ≤ max_dist).

    The character-level member of the near-dup family (minhash/simhash
    miss single-character edits inside shared shingles; edit distance is
    the ground truth for typo/OCR-noise duplicates).  Full-document
    Levenshtein is O(L²) per pair, so comparison is over the first
    ``prefix_len`` normalized characters — the standard bounded surrogate;
    compose with a shingle/LSH prefilter when prefixes can diverge late.

    Character-class normalization: non-ASCII characters project to ``?``
    before the prefix is cut, so the distance is invariant to encoding
    width — engines disagree on what "one edit" means outside ASCII
    (byte-level vs UTF-16-unit vs code-point Levenshtein all differ on
    multi-byte characters; caught by the oracle fuzzer on ``café``), and
    a typo/OCR dedup pass loses nothing by treating all non-ASCII bytes
    as one wildcard class.  Two distinct non-ASCII characters compare
    equal after projection — a documented coarsening, like case folding.

    Blocking: ``|len(a) - len(b)| > max_dist ⇒ dist > max_dist``, so docs
    bucket by ``floor(len / (max_dist+1))`` and only adjacent buckets can
    pair.  One side explodes to its 3 admissible buckets, the join is a
    plain equi-join on the bucket (never an all-pairs cross), and the
    ``id_a < id_b`` filter keeps exactly one orientation of each pair.
    The distance itself uses Spark's threshold form (O(L·d) banded DP,
    early-exit −1) — the verify cost is linear in the prefix, not
    quadratic.  Within-bucket pairing is quadratic per bucket: cap bucket
    population upstream (drop or sub-block degenerate length classes) the
    same way hot shingles are capped in :func:`jaccard_pairs`.
    """
    w = max_dist + 1
    ascii_text = F.regexp_replace(F.col(text_col), "[^\x00-\x7F]", "?")
    key = F.substring(ascii_text, 1, prefix_len)
    base = spread(df).select(
        F.col(id_col).alias("id"),
        key.alias("k"),
        F.length(key).alias("len"),
        F.floor(F.length(key) / F.lit(w)).alias("b"),
    )
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("k").alias("k_a"),
        F.col("len").alias("len_a"),
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("b"),
    )
    b = base.select(
        F.col("id").alias("id_b"),
        F.col("k").alias("k_b"),
        F.col("len").alias("len_b"),
        "b",
    )
    dist = F.levenshtein("k_a", "k_b", max_dist)
    return (
        a.join(b, "b")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def minhash_signatures_wide(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, mh0..mh{k-1}) — k-permutation MinHash over word n-gram shingles.

    Entirely **map-side**: the per-doc shingle set is an ARRAY column
    (:func:`shingle_arrays`), its md5→int64 image is one ``transform``, and
    each permutation min is an ``array_min`` — the signature computation
    never shuffles.  A groupBy(id)-over-exploded-shingles formulation
    shuffles the entire (id, hash) shingle stream first; at 100 TB that
    shuffle dominates the whole LSH pipeline and is pure overhead, because a
    signature is a per-row property of the document.

    ``shingles``: optionally pass a precomputed :func:`shingle_arrays`
    frame (e.g. cached and shared with the verification stage).
    """
    assert k <= len(MINHASH_A)
    sh = shingles if shingles is not None else shingle_arrays(df, id_col, text_col, n)
    # docs with no shingles (< n words) have no signature, as in the
    # exploded formulation (and the DuckDB oracle's len(w) >= n filter).
    # SQL-string lambdas parse JVM-side in one py4j round-trip (see the
    # simhash build-cost note).
    hashed = sh.filter(F.size("shingles") > 0).selectExpr(
        "id",
        "transform(shingles,"
        " s -> cast(conv(substring(md5(s), 1, 8), 16, 10) AS bigint)) AS _h",
    )
    mins = [
        f"array_min(transform(_h,"
        f" x -> ({MINHASH_A[j]}L * x + {MINHASH_B[j]}L) % {MINHASH_P}L)) AS mh{j}"
        for j in range(k)
    ]
    return hashed.selectExpr("id", *mins)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16
) -> DataFrame:
    """(id, j, minhash) — long-format view of :func:`minhash_signatures_wide`."""
    wide = minhash_signatures_wide(df, id_col, text_col, n, k)
    pairs = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.col(f"mh{j}").alias("minhash"))
            for j in range(k)
        ]
    )
    return wide.select("id", F.explode(pairs).alias("p")).select(
        "id", "p.j", "p.minhash"
    )


def band_keys(
    sig: DataFrame,
    k: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id, band, band_key) from a wide signature frame — the LSH index
    rows.  ``max_bucket_size`` drops band buckets above the cap (measured
    within THIS frame) before any join consumes them; see
    :func:`minhash_lsh_pairs` for why the cap is what bounds degenerate
    bucket cross products at 100 TB."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh{j}").cast("string")
                        for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(k // rows_per_band)
        ]
    )
    bands = sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", "bk.band", "bk.band_key"
    )
    if max_bucket_size:
        from pyspark.sql.window import Window

        wsz = Window.partitionBy("band", "band_key")
        bands = (
            bands.withColumn("_sz", F.count(F.lit(1)).over(wsz))
            .filter(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    return bands


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: signature → band keys (k/r bands of r rows) → bucket join
    (candidates = docs sharing ≥1 band bucket) → exact Jaccard verification
    of the candidate set only.  At scale the bucket join shuffles on
    (band, band_key) — the candidate set is tiny relative to the pair
    space, which is the whole point of LSH.

    ``max_bucket_size`` drops band buckets holding more docs than the cap
    before pair generation: a degenerate bucket (boilerplate/empty docs all
    colliding) contributes pairs quadratically in its size — at 100 TB the
    cap is what bounds the worst bucket's cross product (AQE skew-join
    splits the task, but cannot shrink the output).
    """
    # One shared per-doc shingle-array frame feeds the signature (map-side)
    # AND both sides of the verification join — cached so the text split /
    # shingling runs once, not three times.
    sh = shingle_arrays(df, id_col, text_col, n)
    if not df.isStreaming:
        sh = sh.cache()
        # registered so per-batch calls (each batch = a new plan, e.g.
        # incremental_minhash_dedup_full in a foreachBatch loop) cannot
        # accumulate cache entries unboundedly
        _register_convenience_cache(sh, [sh])
    sig = minhash_signatures_wide(df, id_col, text_col, n, k, shingles=sh)
    # Band keys straight from the wide signature — no second aggregation.
    bands = band_keys(sig, k, rows_per_band, max_bucket_size)
    a, b = bands.alias("a"), bands.alias("b")
    candidates = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Exact-Jaccard verification of the candidate pairs only, pair-oriented
    # (cost ∝ |candidates| — see jaccard_verify_pairs; an inverted-index
    # re-join over candidate docs re-pays the bucket cross product).
    exact = jaccard_verify_pairs(candidates, df, id_col, text_col, n, shingles=sh)
    return exact.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def embedding_cosine_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    n_blocks: int = 16,
) -> DataFrame:
    """Exact all-pairs cosine via block-matrix multiplication
    (the Arrow/numpy formulation of :func:`embedding_cosine_pairs`).

    Rows hash into ``n_blocks``; each row is replicated into every
    unordered block pair its block participates in (B copies), and each
    block-pair group computes its cosine submatrix with one vectorized
    numpy matmul, emitting only pairs ≥ threshold.

    Scale math: shuffle volume is B·n rows (choose B ≈ √(n/rows-per-task)),
    against the expression join's n²/2 pair *evaluations*; the matmul runs
    at BLAS speed.  Bit-exactness is preserved without paying for it in the
    hot path: the BLAS scores (pairwise summation, differs from the
    sequential fold only in the last ulp) are used solely to SELECT
    candidate pairs within a safety band below the threshold; every
    emitted pair's cosine is then recomputed with the sequential
    left-fold (cost ∝ candidates ≈ output size, not n²), so outputs are
    bit-identical to :func:`embedding_cosine_pairs` and the DuckDB
    oracle's ``list_sum``.
    """
    v = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("_b", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    pair_keys = F.transform(
        F.sequence(F.lit(0), F.lit(n_blocks - 1)),
        lambda c: F.struct(
            F.least(F.col("_b"), c).cast("int").alias("pi"),
            F.greatest(F.col("_b"), c).cast("int").alias("pj"),
        ),
    )
    rep = v.select("id", "vec", "_b", F.explode(pair_keys).alias("pk"))
    thr = float(threshold)

    def score(key, pdf):
        import numpy as np
        import pandas as pd

        pi, pj = key
        M = np.vstack(pdf["vec"].to_numpy())
        ids = pdf["id"].to_numpy()
        blocks = pdf["_b"].to_numpy()
        dim = M.shape[1]

        # Sequential-order accumulation (d = 0..dim-1), vectorized across
        # rows/pairs: bit-identical to the expression path's left-fold and
        # the DuckDB oracle's list_sum.  Norms are O(n·dim) — cheap enough
        # to always compute sequentially; the O(n²·dim) dot matrix runs at
        # BLAS speed and is only used to pick candidates (band below).
        def seq_norms(X):
            s = np.zeros(X.shape[0])
            for d in range(dim):
                s += X[:, d] * X[:, d]
            n = np.sqrt(s)
            n[n == 0] = 1.0
            return n

        def seq_dots_rowwise(A, B):
            # A, B row-aligned (k, dim) candidate pairs → k exact dots
            s = np.zeros(A.shape[0])
            for d in range(dim):
                s += A[:, d] * B[:, d]
            return s

        # Candidate band: BLAS vs sequential fold differ by ≲1e-13 relative;
        # the output rounds to 6 decimals before the >= thr test, so any
        # pair that could round up to thr sits above thr - 5e-7.  2e-6
        # dominates both effects with orders of magnitude to spare.
        band = thr - 2e-6
        if pi == pj:
            n = seq_norms(M)
            S = (M @ M.T) / (n[:, None] * n[None, :])
            iu, ju = np.triu_indices(len(ids), k=1)
            cand = S[iu, ju] >= band
            iu, ju = iu[cand], ju[cand]  # gather AFTER masking: O(candidates)
            ia, ib = ids[iu], ids[ju]
            cs_exact = seq_dots_rowwise(M[iu], M[ju]) / (n[iu] * n[ju])
        else:
            li, rj = blocks == pi, blocks == pj
            A, B = M[li], M[rj]
            na, nb = seq_norms(A), seq_norms(B)
            S = (A @ B.T) / (na[:, None] * nb[None, :])
            ka, kb = np.nonzero(S >= band)
            ia, ib = ids[li][ka], ids[rj][kb]
            cs_exact = seq_dots_rowwise(A[ka], B[kb]) / (na[ka] * nb[kb])
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        cs_exact = np.floor(cs_exact * 1e6 + 0.5) / 1e6  # q6: np.round is banker's
        m = (cs_exact >= thr) & (lo != hi)
        return pd.DataFrame({"id_a": lo[m], "id_b": hi[m], "cos_sim": cs_exact[m]})

    return rep.groupBy(F.col("pk.pi"), F.col("pk.pj")).applyInPandas(
        score, "id_a long, id_b long, cos_sim double"
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60
) -> DataFrame:
    """(id, simhash) — token-frequency-weighted SimHash over ``bits`` bits
    (60 = the md5-prefix budget that stays int64-exact).

    One narrow shuffle: tokens are hashed map-side (md5 per occurrence —
    summing ±1 per occurrence equals the count-weighted distinct-token
    sum), then a single ``groupBy(id)`` computes all ``bits`` sums as
    codegen'd sum aggregates whose map-side combine collapses each doc to
    one 60-column row before the exchange.  The round-1 formulation
    shuffled the token stream twice (groupBy(id, token) + groupBy(id)); a
    fully map-side array-``aggregate`` variant avoids the shuffle entirely
    but runs 60 interpreted HOF passes per row — measurably slower than
    the codegen'd sums.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    toks = spread(df).select(F.col(id_col).alias("id"), F.explode(words).alias("token"))
    hashed = toks.select("id", md5_int(F.col("token"), 15).alias("h"))  # 60 bits
    # Whole expression trees as single SQL strings: composing 60 sums +
    # 60 bit-packs Column-by-Column costs thousands of py4j round-trips
    # (~1.4 s of driver build time per call — profiled); one expr string
    # parses JVM-side in one round-trip.
    sums_sql = "struct(" + ", ".join(
        f"sum((shiftright(h, {j}) % 2) * 2 - 1) AS s{j}" for j in range(bits)
    ) + ")"
    sums = hashed.groupBy("id").agg(F.expr(sums_sql).alias("s"))
    pack_sql = " + ".join(f"IF(s.s{j} > 0, {1 << j}L, 0L)" for j in range(bits))
    return sums.select("id", F.expr(pack_sql).cast("long").alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ d via pigeonhole blocking.

    Split the signature into d+1 chunks; a pair within distance d must match
    exactly on ≥1 chunk, so the join key is (chunk_idx, chunk_value) — no
    cross join.  Verification computes the true Hamming distance on the
    collided candidates only.
    """
    sig = simhash_signatures(df, id_col, text_col, bits)
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_chunks - 1))).alias("c"),
    ).withColumn(
        "chunk_val",
        F.expr(
            f"shiftright(simhash, cast(c * {chunk_bits} as int))"
            f" % shiftleft(cast(1 as bigint), {chunk_bits})"
        ),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, ["c", "chunk_val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    block_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine near-dup pairs (id_a < id_b, round(cos,6) ≥ t).

    The baseline is the all-pairs self-join — O(n²) and only sane within
    blocks.  ``block_col`` (e.g. an LSH bucket, IVF cluster id, or language)
    restricts pairs to same-block, which is the scale path; see
    similarity.lsh_bucket for a deterministic block assignment.

    Pair-scoring cost: norms are per-row properties, computed ONCE before
    the join (not per pair); with ``dim`` given, the per-pair dot product is
    an unrolled codegen'd expression (~10× over the interpreted fold) with
    identical summation order — results are bit-unchanged.
    """
    from go_streaming_spark.functions import similarity as sim
    from go_streaming_spark.functions.util import spread

    vec = F.col(vec_col).cast("array<double>")
    nrm = sim.norm_expr_unrolled(vec, dim) if dim else sim.norm_expr(vec)
    # zero-norm vectors have no direction: cosine is undefined, and under
    # ANSI mode the division would kill the whole stage (found by the
    # oracle fuzz) — exclude them BEFORE pairing, which is also what the
    # NULL-cosine threshold filter does on the SQL side
    v = spread(df).select(
        F.col(id_col).alias("id"),
        vec.alias("vec"),
        nrm.alias("nrm"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    ).filter(F.col("nrm") > 0)
    a, b = v.alias("a"), v.alias("b")
    on = [F.col("a.id") < F.col("b.id")]
    if block_col:
        joined = a.join(b, on=[F.col("a.blk") == F.col("b.blk"), *on])
    else:
        joined = a.join(b, on=on)
    va, vb = F.col("a.vec"), F.col("b.vec")
    dot = sim.dot_expr_unrolled(va, vb, dim) if dim else sim.dot_expr(va, vb)
    cos = q6(dot / (F.col("a.nrm") * F.col("b.nrm")))
    return (
        joined.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cos.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_cosine_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    block_col: str | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine pairs BETWEEN two frames (every left×right pair with
    round(cos,6) ≥ t) — the cross-table member of
    :func:`embedding_cosine_pairs`.

    The motivating pipeline step is **cross-split leakage detection**: a
    train/test split by id hash is leak-free only at the *exact*-duplicate
    level; near-duplicate pairs that straddle the split inflate eval
    scores, so the split is audited by searching test vectors against the
    train side (the embedding-space analogue of n-gram decontamination,
    ``text.decontaminate``).  Also the shape of query-vs-corpus retrieval
    audits and new-batch-vs-index near-dup checks.

    Same exactness contract as the self-join variant: norms are per-row
    properties computed once per side, the dot product is the unrolled
    sequential fold when ``dim`` is given, zero-norm vectors are excluded
    before pairing (undefined direction; ANSI division guard).  Scale
    path: pass ``block_col`` (LSH bucket / IVF cell on BOTH sides) so the
    join is an equi-join on the block instead of a full cross; without it
    the smaller side should be broadcast-sized.
    """
    from go_streaming_spark.functions import similarity as sim
    from go_streaming_spark.functions.util import spread

    def prep(df: DataFrame, side: str) -> DataFrame:
        vec = F.col(vec_col).cast("array<double>")
        nrm = sim.norm_expr_unrolled(vec, dim) if dim else sim.norm_expr(vec)
        return (
            spread(df)
            .select(
                F.col(id_col).alias(f"id_{side}"),
                vec.alias(f"vec_{side}"),
                nrm.alias(f"nrm_{side}"),
                *([F.col(block_col).alias(f"blk_{side}")] if block_col else []),
            )
            .filter(F.col(f"nrm_{side}") > 0)
        )

    a, b = prep(left, "a"), prep(right, "b")
    if block_col:
        joined = a.join(b, on=F.col("blk_a") == F.col("blk_b"))
    else:
        joined = a.crossJoin(b)
    va, vb = F.col("vec_a"), F.col("vec_b")
    dot = sim.dot_expr_unrolled(va, vb, dim) if dim else sim.dot_expr(va, vb)
    cos = q6(dot / (F.col("nrm_a") * F.col("nrm_b")))
    return joined.select("id_a", "id_b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def embedding_cosine_cross_pairs_blocked(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.99,
    n_blocks: int = 16,
) -> DataFrame:
    """:func:`embedding_cosine_cross_pairs` scored by block-matrix BLAS —
    bit-identical output, an order of magnitude cheaper per pair (the
    64-dim unrolled dot exceeds the codegen method-size budget and falls
    back to interpreted evaluation, measured ~5× the whole-query cost on
    the leakage audit at sf0.1).

    Layout exploits the asymmetry of the audit (the probe side — test
    split, query batch — is the small one): the LEFT side hash-partitions
    into ``n_blocks`` (no replication), the RIGHT side replicates into
    every block, and each block group computes its |A_blk|×|B| cosine
    matrix with one numpy matmul.  Shuffle volume is n_left + n_blocks ×
    n_right rows — versus the symmetric block-pair scheme's (n_left +
    n_right) × √-ish replication — so choose the smaller frame as
    ``right``.  Exactness contract copied from
    :func:`embedding_cosine_pairs_blocked`: BLAS scores only SELECT
    candidates inside a 2e-6 safety band; every emitted pair recomputes
    with the sequential d=0..dim-1 fold and q6-quantizes, so outputs are
    bit-identical to the expression path and the DuckDB oracle.
    Zero-norm vectors are excluded before pairing, as in the expression
    path (threshold-independent).
    """
    vec = F.col(vec_col).cast("array<double>")
    lv = spread(left).select(
        F.col(id_col).alias("id"),
        vec.alias("vec"),
        F.lit(0).alias("side"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_b"),
    )
    rv = (
        spread(right)
        .select(
            F.col(id_col).alias("id"),
            vec.alias("vec"),
            F.lit(1).alias("side"),
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("_eb"),
        )
        .select("id", "vec", "side", F.col("_eb").cast("int").alias("_b"))
    )
    thr = float(threshold)

    def score(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        side = pdf["side"].to_numpy()
        la, rb = side == 0, side == 1
        if not la.any() or not rb.any():
            return empty
        A = np.vstack(pdf["vec"].to_numpy()[la])
        B = np.vstack(pdf["vec"].to_numpy()[rb])
        ia_all = pdf["id"].to_numpy()[la]
        ib_all = pdf["id"].to_numpy()[rb]
        dim = A.shape[1]

        def seq_norms(X):
            s = np.zeros(X.shape[0])
            for d in range(dim):
                s += X[:, d] * X[:, d]
            return np.sqrt(s)

        na, nb = seq_norms(A), seq_norms(B)
        ka_keep, kb_keep = na > 0, nb > 0  # zero-norm: no direction
        if not ka_keep.any() or not kb_keep.any():
            return empty
        A, ia_all, na = A[ka_keep], ia_all[ka_keep], na[ka_keep]
        B, ib_all, nb = B[kb_keep], ib_all[kb_keep], nb[kb_keep]

        band = thr - 2e-6
        S = (A @ B.T) / (na[:, None] * nb[None, :])
        ka, kb = np.nonzero(S >= band)
        if len(ka) == 0:
            return empty
        s = np.zeros(len(ka))
        Ak, Bk = A[ka], B[kb]
        for d in range(dim):
            s += Ak[:, d] * Bk[:, d]
        cs = np.floor(s / (na[ka] * nb[kb]) * 1e6 + 0.5) / 1e6
        m = cs >= thr
        return pd.DataFrame(
            {"id_a": ia_all[ka][m], "id_b": ib_all[kb][m], "cos_sim": cs[m]}
        )

    return lv.unionByName(rv).groupBy("_b").applyInPandas(
        score, "id_a long, id_b long, cos_sim double"
    )


def gram_digest_positions(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, pos, gh): md5 digest of the k-token gram starting at each token
    offset — the shared primitive of substring-span dedup and n-gram
    contamination measurement.  Map-only (split + transform + posexplode);
    the digest keeps every downstream shuffle constant-width in ``k``."""
    df = spread(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # BIND the word array (unbound split in the lambda = per-element
    # re-evaluation, O(words²) per doc — see word_shingles)
    bound = df.select(F.col(id_col).alias("id"), words.alias("__w"))
    w = F.col("__w")
    # gram at position i hashes words[i..i+k); guard: sequence(0, -n) DESCENDS
    starts = F.when(
        F.size(w) >= k, F.sequence(F.lit(0), F.size(w) - k)
    ).otherwise(F.array().cast("array<int>"))
    return bound.select(
        "id",
        F.posexplode(
            F.transform(
                starts, lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, k)))
            )
        ).alias("pos", "gh"),
    )


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    keep_first: bool = False,
) -> DataFrame:
    """Exact SUBSTRING-level duplicate detection: flag every token position
    that starts a ``k``-token gram occurring ≥ ``min_count`` times
    corpus-wide, then merge overlapping/adjacent flagged windows into
    maximal per-document spans (the span-granularity dedup of Lee et al.,
    *Deduplicating Training Data Makes Language Models Better*, 2022 —
    boilerplate headers/footers duplicate across documents that are NOT
    whole-document duplicates, so doc-level dedup never sees them).

    Reference parity: the reference dedups whole events by value
    (/root/reference/pkg/query/operator.go filter/map family); span dedup
    is the corpus-scale generalization a training-data pipeline needs.

    Emits one row per merged span: (id, span_start, span_end, span_tokens)
    — token offsets, inclusive.  Within-doc repeats count toward
    ``min_count`` (a gram appearing twice in ONE doc is a duplicated span).

    Scale (the 100 TB shape):
    - Positions carry a 16-byte md5 digest of the gram, never the k-token
      text — shuffle width is constant in ``k``.
    - Duplicated grams are found with groupBy+semi-join rather than a
      count-over-window: the join is AQE-splittable when one boilerplate
      gram floods a key (a skewed window partition is not), and the
      HAVING-filtered gram list is typically small enough that AQE turns
      the join into a broadcast — the position stream then never shuffles
      at all before the per-document island merge.
    - Island merge is one shuffle on doc id; the groupBy that follows
      reuses the same partitioning.  Total ≈ 2 narrow shuffles, cost ∝
      corpus tokens; nothing pairwise.

    ``keep_first=True`` exempts the globally-FIRST occurrence (min
    (id, pos)) of each duplicated gram, so the emitted spans are directly
    REMOVABLE — feed them to :func:`remove_spans` and exactly one copy of
    every duplicated run survives corpus-wide (Lee et al.'s keep-one
    policy).  The first-occurrence pick is a groupBy min(struct), not a
    rank window, for the same AQE-skew reason as the count.
    """
    if k < 1:
        raise ValueError("k must be ≥ 1")
    grams = gram_digest_positions(df, id_col, text_col, k)
    stats = grams.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct("id", "pos")).alias("_first"),
    ).filter(F.col("_n") >= min_count)
    if keep_first:
        flagged = grams.join(stats, "gh").filter(
            (F.col("id") != F.col("_first.id"))
            | (F.col("pos") != F.col("_first.pos"))
        ).select("id", "pos")
    else:
        flagged = grams.join(stats.select("gh"), "gh", "left_semi")
    return _merge_flagged_spans(flagged, k)


def _merge_flagged_spans(flagged: DataFrame, k: int) -> DataFrame:
    """(id, pos) flagged gram starts → maximal merged (id, span_start,
    span_end, span_tokens) rows.  One shuffle on id; the groupBy reuses
    the window's partitioning."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # new span iff this window starts past the furthest covered offset
    # (pos == prev_end is contiguous → merge; first row: coalesce → new)
    new_span = (F.col("pos") > F.coalesce(prev_end, F.lit(-1))).cast("int")
    return (
        flagged.withColumn("new_span", new_span)
        .withColumn("span_id", F.sum("new_span").over(w))
        .groupBy("id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
            (F.max("pos") + k - F.min("pos")).cast("long").alias("span_tokens"),
        )
        .drop("span_id")
    )


def build_gram_index(
    corpus_df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """(gh, n_occ): corpus-wide k-gram digest counts — the persistable
    corpus-side state of INCREMENTAL substring-span dedup (write it to
    parquet per corpus snapshot; append new batches' counts as the corpus
    grows).  Narrow (two columns), map-side combined."""
    return gram_digest_positions(corpus_df, id_col, text_col, k).groupBy(
        "gh"
    ).agg(F.count(F.lit(1)).alias("n_occ"))


def duplicated_spans_against_index(
    batch_df: DataFrame,
    index_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Incremental :func:`duplicated_spans`: spans in the BATCH whose grams
    reach ``min_count`` counting corpus occurrences (from a prebuilt
    :func:`build_gram_index` frame) PLUS in-batch occurrences — exactly
    ``duplicated_spans(corpus ∪ batch)`` restricted to batch documents,
    without touching corpus text (the recurring-crawl ingestion shape,
    like :func:`dedup_against_index` for MinHash).

    Scale: the index join is digest-on-digest (AQE-splittable); corpus
    cost is the index scan only.  For streaming, run per micro-batch via
    ``foreachBatch`` against a snapshot index, appending each batch's
    :func:`build_gram_index` output afterwards.
    """
    grams = gram_digest_positions(batch_df, id_col, text_col, k)
    in_batch = grams.groupBy("gh").agg(F.count(F.lit(1)).alias("_bn"))
    counts = in_batch.join(
        index_df.select("gh", F.col("n_occ").alias("_cn")), "gh", "left"
    ).filter(F.col("_bn") + F.coalesce(F.col("_cn"), F.lit(0)) >= min_count)
    flagged = grams.join(counts.select("gh"), "gh", "left_semi")
    return _merge_flagged_spans(flagged, k)


def remove_spans(
    df: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Cut the given (id, span_start, span_end) token ranges out of each
    document's text — the removal half of substring dedup.  ``spans`` is
    typically :func:`duplicated_spans` output, filtered by the caller's
    keep policy (e.g. anti-joined against the canonical occurrence to keep
    one copy corpus-wide, Lee et al. §3).

    Docs with no spans pass through unchanged.  Pure column ops: spans
    aggregate to an array per doc, then one filter over the token array —
    no UDF, one shuffle (the span groupBy; the join broadcasts when few
    docs have spans).
    """
    cut = spans.groupBy(F.col("id").alias("__id")).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    kept = F.filter(
        F.zip_with(words, F.sequence(F.lit(0), F.size(words) - 1), lambda tok, i: F.struct(tok.alias("tok"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["span_start"]) & (s["i"] <= sp["span_end"]),
        ),
    )
    out = (
        df.join(cut, df[id_col] == F.col("__id"), "left")
        .withColumn(
            text_col,
            F.when(F.col("__id").isNull(), F.col(text_col)).otherwise(
                F.concat_ws(" ", F.transform(kept, lambda s: s["tok"]))
            ),
        )
        .drop("__id", "__spans")
    )
    return out


def keep_best_per_component(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str,
) -> DataFrame:
    """Near-dup dedup that keeps the HIGHEST-QUALITY copy of each
    duplicate cluster instead of the arbitrary minimum id — what
    production pipelines actually want once a quality score exists
    (e.g. :func:`go_streaming_spark.functions.text.hashed_linear_score`):
    the boilerplate-laden mirror of a page should lose to the clean one.

    Components come from min-label propagation over ``pairs``; within a
    component the survivor maximizes (score, then smaller id on ties —
    deterministic).  Rows outside any pair survive unconditionally.
    Returns the surviving rows of ``df`` (all columns).

    Scale: the component table is ~|paired docs| (AQE-broadcastable);
    the winner per component is ONE min-struct groupBy (map-side
    combine, the argmin idiom — no window over the corpus), and the
    final keep is a semi-join on the id.
    """
    from go_streaming_spark.functions.graph import dedup_components

    comps = dedup_components(pairs).withColumnsRenamed(
        {"doc_id": "__kb_id", "cluster_id": "__kb_comp"}
    )
    member = df.join(
        comps, df[id_col] == F.col("__kb_id"), "inner"
    ).select(
        F.col("__kb_comp").alias("comp"),
        F.col(id_col).alias("mid"),
        F.col(score_col).alias("s"),
    )
    # argmax(score) with min-id tie-break == min over (-score, id) struct
    winners = (
        member.groupBy("comp")
        .agg(F.min(F.struct((-F.col("s")).alias("ns"), F.col("mid").alias("mid"))).alias("w"))
        .select(F.col("w.mid").alias("__kb_keep"))
    )
    losers_removed = df.join(
        comps, df[id_col] == F.col("__kb_id"), "left_anti"
    )
    kept_members = df.join(
        winners, df[id_col] == F.col("__kb_keep"), "left_semi"
    )
    return losers_removed.unionByName(kept_members)


# lsh_recall_stats runs its exact side UNCAPPED by design; above this
# many input docs it refuses to run without an explicit unbounded_ok —
# the same refuse-the-quadratic-regime default as
# DEFAULT_MAX_CANDIDATE_PAIRS on the pair joins.
DEFAULT_MAX_RECALL_AUDIT_DOCS = 100_000


def lsh_recall_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.5,
    max_docs: int = DEFAULT_MAX_RECALL_AUDIT_DOCS,
    unbounded_ok: bool = False,
) -> DataFrame:
    """Measured RECALL of the banded MinHash index against exact
    n-gram-Jaccard ground truth — the parameter-tuning audit for
    (k, rows_per_band) at a given threshold: one row
    (n_true_pairs, n_lsh_pairs, recall).

    LSH is the 100 TB dedup path precisely because it never enumerates
    the quadratic pair space — which also means its misses are silent.
    Run this on a BOUNDED sample (hash-select the input first, e.g.
    ``df.filter(col(id) % 997 == 0)``: the exact side is the inverted-
    index pair join, affordable only at sample scale) per corpus
    snapshot; a recall drop means the banding no longer matches the
    corpus' similarity profile (e.g. shorter documents → noisier
    signatures) and (k, rows_per_band) need re-tuning before the next
    crawl epoch, not after it has silently shipped duplicates.

    Both sides run UNCAPPED (``max_shingle_freq=None``): the exact side
    must be ground truth, not the production-capped approximation, and
    LSH verification already uses uncapped shingle sets.  Verified LSH
    pairs are a subset of the true pairs by construction, so
    ``recall = n_lsh / n_true`` needs no pair-level join; NULL when the
    sample has no true pairs.

    The bounded-sample contract is ENFORCED, not just documented: inputs
    above ``max_docs`` raise unless ``unbounded_ok=True`` — a caller
    pointing the audit at a full corpus would otherwise run the exact
    all-pairs inverted-index join at corpus scale (the one row-count
    check is metadata-cheap next to the audit itself).  The two sides
    each build their own cached shingle frame (``jaccard_pairs`` word
    shingles, ``minhash_lsh_pairs`` shingle arrays), so the text
    split/shingling runs roughly twice — accepted on a bounded sample;
    thread a shared shingle frame only if the audit cadence ever makes
    it the bottleneck.
    """
    from go_streaming_spark.functions.util import q6

    if not unbounded_ok:
        n_docs = df.count()
        if n_docs > max_docs:
            raise ValueError(
                f"lsh_recall_stats: {n_docs} input docs exceeds the"
                f" {max_docs}-doc audit bound and the exact ground-truth"
                " side runs UNCAPPED (all-pairs inverted-index join) —"
                " hash-select a sample first (e.g."
                f" df.filter(col({id_col!r}) % 997 == 0)) or pass"
                " unbounded_ok=True to accept the quadratic regime"
            )
    true_n = (
        jaccard_pairs(
            df, id_col, text_col, n, threshold,
            max_shingle_freq=None, max_candidate_pairs=None,
        )
        .agg(F.count(F.lit(1)).alias("n_true_pairs"))
    )
    lsh_n = (
        minhash_lsh_pairs(df, id_col, text_col, n, k, rows_per_band, threshold)
        .agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    )
    return true_n.crossJoin(F.broadcast(lsh_n)).select(
        "n_true_pairs",
        "n_lsh_pairs",
        F.when(
            F.col("n_true_pairs") > 0,
            q6(F.col("n_lsh_pairs").cast("double") / F.col("n_true_pairs")),
        ).alias("recall"),
    )
