"""Bucketed-layout tests: the write-once-shuffle-never join contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_streaming_spark.operators.layout import drop_table, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = write_bucketed(orders, "t_orders_b", "o_orderkey", 4)
        bl = write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", 4)
        joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])
        plan = _plan(joined)
        # no shuffle: bucket-to-bucket merge join (a BroadcastExchange
        # would also be shuffle-free, but we disabled broadcast to prove
        # the bucketed SMJ path)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # ...and the result matches the plain (shuffled) join
        plain = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        assert joined.count() == plain.count()

        # groupBy on the bucket key also plans shuffle-free
        agg = bl.groupBy("l_orderkey").agg(F.sum("l_quantity"))
        assert "Exchange hashpartitioning" not in _plan(agg), _plan(agg)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        drop_table(spark, "t_orders_b")
        drop_table(spark, "t_lineitem_b")


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join WITHOUT the layout shuffles both sides."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]))
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
