"""DuckDB-oracle differential sweep at sf0.001 — the local mirror of the
driver's t2 correctness gate. Every oracle-paired query must match on
row count, column names, and order-insensitive values (strict float
bits — the determinism policy guarantees it)."""

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


@pytest.mark.parametrize(
    "qdef", [q for q in QUERIES if q.oracle is None], ids=lambda q: q.name
)
def test_rows_only_queries_run(spark, qdef):
    assert qdef.fn(spark, SF_DIR).count() >= 0
