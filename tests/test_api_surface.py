"""Direct tests for public API functions not exercised through any
registry query or pipeline path — the orphan audit (r6) found these
six; each is reference-parity surface a user can call directly."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F


def test_stopword_ratio_known_string(spark):
    from ubeardw_databricks_lakehouse_spark.operators.text import (
        stopword_ratio,
    )

    df = spark.createDataFrame(
        [("the cat and the dog",), ("quantum flux capacitor",), ("",)],
        "t string",
    )
    got = [r["r"] for r in df.select(stopword_ratio("t").alias("r")).collect()]
    assert got[0] == 3 / 5  # the, and, the
    assert got[1] == 0.0
    assert got[2] == 0.0  # empty text guarded by greatest(size, 1)


def test_safe_cast_money_malformed_to_null(spark):
    from ubeardw_databricks_lakehouse_spark.functions.cleaning import (
        safe_cast_money,
    )

    df = spark.createDataFrame(
        [("12.34",), ("abc",), (None,), ("1e2",)], "v string"
    )
    got = [r["m"] for r in df.select(safe_cast_money("v").alias("m")).collect()]
    assert got[0] == Decimal("12.34")
    assert got[1] is None and got[2] is None
    assert got[3] == Decimal("100.00")  # scientific notation parses


def test_email_predicates(spark):
    from ubeardw_databricks_lakehouse_spark.functions.cleaning import (
        email_format_pred,
        valid_email_pred,
    )

    df = spark.createDataFrame(
        [("a@b.co",), ("nope",), (None,), ("x@y",)], "email string"
    )
    rows = df.select(
        valid_email_pred().alias("v"), email_format_pred().alias("f")
    ).collect()
    # the expectation predicate is null-rejecting (isNotNull
    # short-circuits null to False — a null email FAILS the rule);
    # the bare format regex keeps SQL null semantics.
    assert [r["v"] for r in rows] == [True, False, False, True]
    assert [r["f"] for r in rows] == [True, False, None, False]


def test_analyze_table_smoke(spark, tmp_path):
    from ubeardw_databricks_lakehouse_spark.maintenance.optimize import (
        analyze_table,
    )
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse

    lake = Lakehouse(spark, str(tmp_path))
    lake.overwrite("t", spark.range(100).withColumn("v", F.col("id") * 2))
    analyze_table(lake, "t")  # must run the stats scan without error


def test_register_views_enables_sql(spark):
    from ubeardw_databricks_lakehouse_spark.core.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    assert spark.sql("SELECT COUNT(*) AS c FROM region").collect()[0]["c"] == 5


def test_run_all_single_query(spark):
    from ubeardw_databricks_lakehouse_spark.testing.oracle import run_all

    res = run_all(
        spark, "/root/testdata/sf0.001", only=["q01_pricing_summary"]
    )
    assert set(res) == {"q01_pricing_summary"}
    r = res["q01_pricing_summary"]
    assert r["values_match"] and r["dtype_match"] and r["driver_safe"]
