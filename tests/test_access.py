"""Fine-grained access control: deny-by-default, filters, masks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.storage.access import (
    PolicyCatalog,
    TablePolicy,
    apply_policy,
)
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse


@pytest.fixture()
def lake(spark, tmp_path):
    lk = Lakehouse(spark, str(tmp_path))
    lk.overwrite(
        "people",
        spark.createDataFrame(
            [(1, "alice", "eng", 100.0), (2, "bob", "hr", 200.0),
             (3, "carol", "eng", 300.0)],
            "id long, name string, dept string, salary double",
        ),
    )
    return lk


def test_deny_by_default_and_grant_revoke(lake):
    cat = PolicyCatalog(lake)
    with pytest.raises(PermissionError):
        cat.read_as("analyst", "people")
    cat.grant("analyst", "people", TablePolicy())
    assert cat.read_as("analyst", "people").count() == 3
    cat.revoke("analyst", "people")
    with pytest.raises(PermissionError):
        cat.read_as("analyst", "people")


def test_row_filter_and_masks_apply_in_order(lake, spark):
    cat = PolicyCatalog(lake)
    cat.grant(
        "analyst",
        "people",
        TablePolicy(
            row_filter="dept = 'eng'",
            column_masks={
                "name": "sha2(name, 256)",
                "salary": "cast(0.0 as double)",
            },
        ),
    )
    rows = cat.read_as("analyst", "people").collect()
    assert {r["id"] for r in rows} == {1, 3}  # hr row filtered out
    assert all(len(r["name"]) == 64 for r in rows)  # pseudonymized
    assert all(r["salary"] == 0.0 for r in rows)  # fully redacted
    # schema unchanged by governance
    assert [f.name for f in cat.read_as("analyst", "people").schema.fields] == [
        "id", "name", "dept", "salary",
    ]


def test_mask_type_is_preserved_and_unknown_column_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    out = apply_policy(df, TablePolicy(column_masks={"id": "pmod(id, 10)"}))
    assert dict(out.dtypes)["id"] == "bigint"
    with pytest.raises(ValueError, match="unknown column"):
        apply_policy(df, TablePolicy(column_masks={"nope": "1"}))


def test_masks_evaluate_over_original_row(spark):
    """Unity Catalog semantics: every mask sees the PRE-mask row. A
    mask on `tag` that references `salary` must read the original
    salary even though salary itself is masked to 0 — and the result
    must not depend on dict insertion order."""
    df = spark.createDataFrame(
        [(1, 100.0, ""), (2, 500.0, "")], "id long, salary double, tag string"
    )
    for masks in (
        {"salary": "cast(0.0 as double)", "tag": "if(salary > 200, 'high', 'low')"},
        {"tag": "if(salary > 200, 'high', 'low')", "salary": "cast(0.0 as double)"},
    ):
        rows = {
            r["id"]: (r["salary"], r["tag"])
            for r in apply_policy(df, TablePolicy(column_masks=masks)).collect()
        }
        assert rows == {1: (0.0, "low"), 2: (0.0, "high")}


def test_row_filter_pushes_into_scan(lake):
    """Governance must be plan rewriting: the row filter reaches the
    parquet scan as a pushed predicate."""
    cat = PolicyCatalog(lake)
    cat.grant("a", "people", TablePolicy(row_filter="dept = 'eng'"))
    df = cat.read_as("a", "people")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    fmt = buf.getvalue()
    assert "PushedFilters" in fmt
    assert "dept" in fmt.split("PushedFilters", 1)[1][:200]
