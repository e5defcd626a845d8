"""Data-quality expectation operator unit tests."""

import pytest


def test_check_expectations_null_counts_as_violation(spark):
    from pyspark.sql import functions as F

    from go_streaming_spark.functions.dq import check_expectations

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None)], "id long, amount double"
    )
    out = {
        r["rule"]: (r["n_rows"], r["n_violations"])
        for r in check_expectations(
            df,
            {
                "amount_positive": F.col("amount") > 0,
                "id_small": F.col("id") <= 2,
            },
        ).collect()
    }
    # NULL amount → rule can't be evaluated → violation
    assert out["amount_positive"] == (3, 2)
    assert out["id_small"] == (3, 1)


def test_check_expectations_single_scan(spark):
    """All rules must ride ONE scan — adding a rule costs no extra I/O."""
    from pyspark.sql import functions as F

    from go_streaming_spark.functions.dq import check_expectations

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rep = check_expectations(
        df,
        {
            "a": F.col("o_totalprice") > 0,
            "b": F.col("o_custkey").isNotNull(),
            "c": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan


def test_check_expectations_empty_rules_rejected(spark):
    from go_streaming_spark.functions.dq import check_expectations

    df = spark.range(3)
    with pytest.raises(ValueError):
        check_expectations(df, {})


def test_fk_violations_counts_orphans_and_nulls(spark):
    from go_streaming_spark.functions.dq import fk_violations

    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame(
        [(10,), (20,), (20,)], "pk long"  # duplicate pk must not multiply
    )
    row = fk_violations(child, "fk", parent, "pk").collect()[0]
    assert (row["rule"], row["n_rows"], row["n_violations"]) == ("fk:fk", 4, 2)


def test_profile_columns_counts_nulls_and_distincts(spark):
    from go_streaming_spark.functions.dq import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    out = {r["column"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 4
    assert (out["k"]["n_null"], out["k"]["n_distinct"]) == (1, 2)
    assert (out["s"]["n_null"], out["s"]["n_distinct"]) == (1, 2)


def test_profile_columns_single_scan(spark):
    from go_streaming_spark.functions.dq import profile_columns

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = (
        profile_columns(df, ["o_custkey", "o_orderstatus"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan
