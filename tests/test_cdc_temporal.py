"""Unit tests for functions/cdc.py (SCD2 + latest-wins merge),
timeseries.resample_locf, text.bm25_scores, and
dedup.edit_distance_pairs."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from go_streaming_spark.functions import cdc, dedup, text, timeseries


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- SCD2


def test_scd2_intervals_partition_timeline(spark):
    rows = [
        (1, _ts("2024-01-01T00:00:00"), 10, "a"),
        (1, _ts("2024-02-01T00:00:00"), 11, "b"),
        (1, _ts("2024-03-01T00:00:00"), 12, "c"),
        (2, _ts("2024-01-15T00:00:00"), 20, "z"),
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, id long, v string")
    out = cdc.scd2_history(df, "key", "ts", "id", sentinel_us=10**18)
    got = {
        (r.key, r.id): (r.valid_from_us, r.valid_to_us)
        for r in out.collect()
    }
    us = lambda s: int(_ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert got[(1, 10)] == (us("2024-01-01T00:00:00"), us("2024-02-01T00:00:00"))
    assert got[(1, 11)] == (us("2024-02-01T00:00:00"), us("2024-03-01T00:00:00"))
    assert got[(1, 12)] == (us("2024-03-01T00:00:00"), 10**18)
    assert got[(2, 20)] == (us("2024-01-15T00:00:00"), 10**18)
    # intervals per key partition the timeline: each valid_to equals the
    # next valid_from, no gaps, no overlaps
    k1 = sorted(v for (k, _), v in got.items() if k == 1)
    for (a, b), (c, _) in zip(k1, k1[1:]):
        assert b == c


def test_scd2_same_timestamp_ties_order_by_tie_col(spark):
    t0 = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, t0, 5, "old"), (1, t0, 7, "new")],
        "key long, ts timestamp, id long, v string",
    )
    out = cdc.scd2_history(df, "key", "ts", "id", sentinel_us=10**18)
    got = {r.id: (r.valid_from_us, r.valid_to_us) for r in out.collect()}
    # higher tie_col wins the open-ended (current) interval
    assert got[7][1] == 10**18
    assert got[5][1] == got[7][0]


# ---------------------------------------------------- latest-wins merge


def test_cdc_apply_latest_wins_and_untouched_keys(spark):
    snap = spark.createDataFrame(
        [("A", _ts("2024-01-01T00:00:00"), 1, "a1"),
         ("B", _ts("2024-01-02T00:00:00"), 2, "b1")],
        "key string, ts timestamp, id long, v string",
    )
    changes = spark.createDataFrame(
        [("B", _ts("2024-02-01T00:00:00"), 3, "b2"),
         ("B", _ts("2024-02-05T00:00:00"), 4, "b3"),
         ("C", _ts("2024-02-03T00:00:00"), 5, "c1")],
        "key string, ts timestamp, id long, v string",
    )
    out = cdc.cdc_apply(snap, changes, "key", "ts", "id")
    got = {r.key: r.v for r in out.collect()}
    assert got == {"A": "a1", "B": "b3", "C": "c1"}
    assert out.count() == 3  # one row per key


def test_latest_per_key_tie_breaks_on_tie_col(spark):
    t0 = _ts("2024-01-01T00:00:00")
    df = spark.createDataFrame(
        [(1, t0, 5, "lo"), (1, t0, 9, "hi")],
        "key long, ts timestamp, id long, v string",
    )
    out = cdc.latest_per_key(df, "key", "ts", "id").collect()
    assert len(out) == 1 and out[0].v == "hi"


# ------------------------------------------------------- LOCF resample


def test_resample_locf_fills_gaps_and_counts(spark):
    base = 1_700_000_000_000_000  # µs
    bucket = 1_000_000  # 1s buckets
    rows = [
        (1, base + 100, 10.0, 1),       # bucket 0
        (1, base + 900, 11.0, 2),       # bucket 0 (later → wins)
        (1, base + 3 * bucket + 5, 30.0, 3),  # bucket 3
        (2, base + 0, 99.0, 4),         # single-obs key
    ]
    df = spark.createDataFrame(
        rows, "user long, t_us long, value double, eid long"
    ).withColumn("ts", F.timestamp_micros(F.col("t_us")))
    out = timeseries.resample_locf(df, "user", "ts", "value", bucket, "eid")
    got = {(r.key, r.bucket_start_us): (r.value_f, r.n_obs) for r in out.collect()}
    b0 = (base // bucket) * bucket
    assert got[(1, b0)] == (11.0, 2)          # in-bucket last by (ts, tie)
    assert got[(1, b0 + bucket)] == (11.0, 0)  # filled gap
    assert got[(1, b0 + 2 * bucket)] == (11.0, 0)
    assert got[(1, b0 + 3 * bucket)] == (30.0, 1)
    assert got[(2, b0)] == (99.0, 1)
    assert len(got) == 5  # exactly first..last bucket per key


# ---------------------------------------------------------------- BM25


def test_bm25_hand_computed_single_term(spark):
    docs = [
        (1, "x x y"),        # tf=2, dl=3
        (2, "x z"),          # tf=1, dl=2
        (3, "y z w q"),      # tf=0, dl=4
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r.bm25 for r in
           text.bm25_scores(df, "doc_id", "text", ["x"]).collect()}
    # N=3, total=9, avgdl=3; df(x)=2 → idf=(3-2+0.5)/(2.5)=0.6
    k1, b = 1.2, 0.75
    def score(tf, dl):
        dr = dl * 3 / 9
        t = tf * 2.2 / (tf + k1 * (0.25 + b * dr))
        import math
        return math.floor(0.6 * t * 1e6 + 0.5) / 1e6
    assert out[1] == pytest.approx(score(2, 3), abs=2e-6)
    assert out[2] == pytest.approx(score(1, 2), abs=2e-6)
    assert 3 not in out  # no matching term → no row


def test_bm25_multi_term_is_sum_of_term_scores(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a b b c")], "doc_id long, text string"
    )
    both = {r.id: r.bm25 for r in
            text.bm25_scores(df, "doc_id", "text", ["a", "b"]).collect()}
    a = {r.id: r.bm25 for r in
         text.bm25_scores(df, "doc_id", "text", ["a"]).collect()}
    b = {r.id: r.bm25 for r in
         text.bm25_scores(df, "doc_id", "text", ["b"]).collect()}
    for i in (1, 2):
        assert both[i] == pytest.approx(a[i] + b[i], abs=2e-6)


# ----------------------------------------------------- edit distance


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_match_bruteforce(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcd"
    texts = []
    for i in range(30):
        base = "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 24)))
        texts.append((i, base))
        if rng.random() < 0.5:  # planted near-dup: 0-3 edits
            s = list(base)
            for _ in range(rng.randint(0, 3)):
                op = rng.choice("ids")
                p = rng.randrange(len(s)) if s else 0
                if op == "i":
                    s.insert(p, rng.choice(alphabet))
                elif s:
                    if op == "d":
                        del s[p]
                    else:
                        s[p] = rng.choice(alphabet)
            texts.append((100 + i, "".join(s)))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.dist for r in
           dedup.edit_distance_pairs(df, "doc_id", "text", max_dist=3).collect()}
    want = {}
    for i, (ia, ta) in enumerate(texts):
        for ib, tb in texts[i + 1:]:
            x, y = min(ia, ib), max(ia, ib)
            d = _lev(ta, tb)
            if d <= 3:
                want[(x, y)] = d
    assert got == want  # blocking misses nothing, adds nothing, once each


def test_edit_distance_pairs_plan_has_no_cross_join(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "doc_id long, text string")
    plan = dedup.edit_distance_pairs(df, "doc_id", "text", 2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snapshot_diff_digest_mode_matches_column_mode(spark):
    from go_streaming_spark.functions.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, None, "C"), (4, 40.0, None)],
        "k long, p double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 21.0, "B"), (3, None, "C2"), (5, 50.0, "E")],
        "k long, p double, s string",
    )
    col_mode = sorted(
        map(tuple, snapshot_diff(old, new, ["k"], ["p", "s"]).collect())
    )
    dig_mode = sorted(
        map(tuple, snapshot_diff(old, new, ["k"], ["p", "s"], digest=True).collect())
    )
    expected = [(2, "changed"), (3, "changed"), (4, "removed"), (5, "added")]
    assert col_mode == dig_mode == expected


def test_partition_fingerprint_detects_divergent_partition(spark):
    """Manifests of two copies must agree exactly on untouched partitions
    and differ only on the mutated one; order-insensitivity means a
    reshuffled copy fingerprints identically."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions.cdc import partition_fingerprint

    a = spark.createDataFrame(
        [(i, ["x", "y"][i % 2], float(i)) for i in range(40)],
        "id long, part string, v double",
    )
    prep = lambda df: df.select(
        "part", F.col("id").cast("string").alias("k"),
        F.col("v").cast("string").alias("val"),
    )
    ma = {r["part"]: (r["n_rows"], r["xor_hash"])
          for r in partition_fingerprint(prep(a), ["part"], ["k", "val"]).collect()}
    # reshuffled copy → identical manifest
    mb = {r["part"]: (r["n_rows"], r["xor_hash"])
          for r in partition_fingerprint(
              prep(a.repartition(7)), ["part"], ["k", "val"]).collect()}
    assert ma == mb
    # mutate one row in partition 'y' → only 'y' diverges
    c = a.withColumn(
        "v", F.when(F.col("id") == 1, F.lit(999.0)).otherwise(F.col("v"))
    )
    mc = {r["part"]: (r["n_rows"], r["xor_hash"])
          for r in partition_fingerprint(prep(c), ["part"], ["k", "val"]).collect()}
    assert mc["x"] == ma["x"]
    assert mc["y"] != ma["y"]
