"""DuckDB-oracle differential sweep at sf0.001 — the local mirror of the
driver's t2 correctness gate. Every oracle-paired query must match on
row count, column names, order-insensitive values (strict float bits —
the determinism policy guarantees it), coarse dtype kinds, AND emit
only driver-safe final kinds (no DECIMAL/HUGEINT finals — r5 proved
those hash-red at the driver even with locally-exact values)."""

from __future__ import annotations

import pytest

from ubeardw_databricks_lakehouse_spark.plans.registry import QUERIES
from ubeardw_databricks_lakehouse_spark.testing.oracle import (
    compare_query,
    duck_con,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize(
    "qdef", [q for q in QUERIES if q.oracle is not None], ids=lambda q: q.name
)
def test_oracle_match(spark, con, qdef):
    r = compare_query(spark, con, qdef.fn, qdef.oracle, SF_DIR)
    assert r["cols_match"], f"columns differ: {r.get('cols_spark')} vs {r.get('cols_duck')}"
    assert r["count_match"], f"row count {r['rows_spark']} vs {r['rows_duck']}"
    assert r["values_match"], f"value mismatch, first diffs: {r.get('first_diffs')}"
    assert r["dtype_match"], f"dtype kind mismatch: {r.get('dtype_diffs')}"
    assert r["driver_safe"], (
        f"driver-unsafe final column kinds (DECIMAL/HUGEINT finals "
        f"hash-red at the driver even with exact values — cast to "
        f"DOUBLE per plans/common.py): {r.get('unsafe_cols')}"
    )


@pytest.mark.parametrize(
    "qdef", [q for q in QUERIES if q.oracle is None], ids=lambda q: q.name
)
def test_rows_only_queries_run(spark, qdef):
    assert qdef.fn(spark, SF_DIR).count() >= 0


def test_harness_flags_decimal_final_as_driver_unsafe(spark, con):
    """r5 regression guard: a query pair whose values are EXACTLY equal
    but whose final column is raw DECIMAL on both engines must be
    red-flagged (driver_safe=False) — this is precisely the shape that
    was sweep-green yet driver-hash-red in round 5."""
    from pyspark.sql import functions as F

    def decimal_twin(sp, _sf):
        return sp.range(1).select(
            F.lit("2.450000").cast("decimal(18,6)").alias("score")
        )

    r = compare_query(
        spark, con, decimal_twin,
        "SELECT CAST('2.450000' AS DECIMAL(18,6)) AS score", SF_DIR,
    )
    assert r["values_match"] and r["cols_match"] and r["count_match"]
    assert r["dtype_match"]  # both sides agree it's decimal…
    assert not r["driver_safe"]  # …and that is exactly the problem
    assert r["unsafe_cols"] == [("score", "decimal", "decimal")]


def test_harness_flags_hugeint_as_driver_unsafe(spark, con):
    """The r1 artifact shape: DuckDB SUM(BIGINT) yields HUGEINT (pandas
    object dtype at the driver) — must be red-flagged even though the
    coarse-kind diff already catches the asymmetry."""
    from pyspark.sql import functions as F

    def int_twin(sp, _sf):
        return sp.range(1).select(F.lit(7).cast("bigint").alias("s"))

    r = compare_query(
        spark, con, int_twin,
        "SELECT SUM(x) AS s FROM (SELECT CAST(7 AS BIGINT) AS x)", SF_DIR,
    )
    assert not r["driver_safe"]
    assert not r["dtype_match"]
