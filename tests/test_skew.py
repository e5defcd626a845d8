"""Skew helpers: salted join/agg must equal their plain counterparts."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_streaming_spark.operators.skew import salted_agg, salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one hot key
    left = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", i * 1.0) for i in range(1000)],
        "id long, k string, v double",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k10", 2), ("k20", 3), ("k30", 4)], "k string, r long"
    )
    plain = left.join(right, on=["k"]).select("id", "k", "v", "r")
    salted = salted_join(left, right, on=["k"], salt=8).select("id", "k", "v", "r")
    assert sorted(map(str, salted.collect())) == sorted(map(str, plain.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string")
    right = spark.createDataFrame([("a", 10)], "k string, r long")
    out = salted_join(left, right, on=["k"], salt=4, how="left")
    got = {(r.id, r.r) for r in out.collect()}
    assert got == {(1, 10), (2, None)}


def test_salted_agg_equals_plain_agg(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 5 else f"k{i}", float(i)) for i in range(2000)],
        "id long, k string, v double",
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"), F.max("v").alias("hi"),
    )
    salted = salted_agg(
        df, ["k"],
        {"s": ("sum", "v"), "n": ("count", "v"), "lo": ("min", "v"), "hi": ("max", "v")},
        salt=16,
    )
    assert sorted(map(str, salted.select("k", "s", "n", "lo", "hi").collect())) == sorted(
        map(str, plain.select("k", "s", "n", "lo", "hi").collect())
    )


def test_salted_join_rejects_right_preserving(spark):
    # right/full-outer would emit each unmatched right row once per replica
    import pytest

    left = spark.createDataFrame([(1, "a")], "id long, k string")
    right = spark.createDataFrame([("a", 10), ("b", 20)], "k string, r long")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="right-preserving"):
            salted_join(left, right, on=["k"], how=how)


def test_salted_agg_rejects_holistic(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with pytest.raises(ValueError, match="non-re-aggregatable"):
        salted_agg(df, ["k"], {"x": ("collect_list", "id")})


def test_adaptive_join_routes_by_measured_skew(spark):
    """Hot-key input must route through the salted plan (visible as the
    salt-replica explode in the physical plan); uniform input must stay
    a plain join.  Results equal the plain join in BOTH regimes."""
    from pyspark.sql import functions as F

    from go_streaming_spark.operators.skew import adaptive_join

    dim = spark.createDataFrame(
        [(k, f"v{k}") for k in range(10)], "k long, payload string"
    )
    hot = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(1000)], "k long, x long"
    )  # ~90% of rows on k=0
    uni = spark.createDataFrame(
        [(i % 10, i) for i in range(1000)], "k long, x long"
    )

    for fact, expect_salted in ((hot, True), (uni, False)):
        out = adaptive_join(fact, dim, ["k"], share_threshold=0.2)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert ("explode" in plan.lower()) == expect_salted, plan[:500]
        got = sorted((r.k, r.x, r.payload) for r in out.collect())
        ref = sorted(
            (r.k, r.x, r.payload) for r in fact.join(dim, "k").collect()
        )
        assert got == ref
