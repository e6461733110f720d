"""Hand-case and pure-python replay tests for the r7 statistics/
analytics battery: MAD outliers, gaps-and-islands streaks, Gini
concentration, chi-square drift, brand co-purchase CF. The
registry-wide oracle differential proves Spark == DuckDB; these prove
both engines == the formula, with no SQL engine in the loop."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_mad_outlier_summary_hand_case(spark):
    from ubeardw_databricks_lakehouse_spark.operators.stats import (
        mad_outlier_summary,
    )

    # 1..9 plus one wild 100: median 5.5, deviations sorted
    # [0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,94.5] -> MAD 2.5,
    # threshold 7.5 -> exactly the 100 flags
    df = spark.createDataFrame(
        [("g", float(v)) for v in list(range(1, 10)) + [100]],
        ["grp", "value"],
    )
    r = mad_outlier_summary(df, "value", "grp", k=3.0).collect()[0]
    assert r["n"] == 10
    assert r["med"] == 5.5 and r["mad"] == 2.5
    assert r["n_outliers"] == 1
    assert abs(r["outlier_rate"] - 0.1) < 1e-15


def test_mad_outlier_zero_mad_flags_all_deviants(spark):
    from ubeardw_databricks_lakehouse_spark.operators.stats import (
        mad_outlier_summary,
    )

    # majority-constant group: MAD == 0, so every row off the median
    # flags (strict > keeps the exact-median rows in)
    df = spark.createDataFrame(
        [("g", v) for v in [5.0, 5.0, 5.0, 5.0, 9.0, 1.0]],
        ["grp", "value"],
    )
    r = mad_outlier_summary(df, "value", "grp").collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 2


def _python_streaks(days: list) -> tuple[int, int, int]:
    """(n_active_days, n_streaks, longest) by direct consecutive scan."""
    days = sorted(days)
    streaks, cur = [], 1
    for a, b in zip(days, days[1:]):
        if (b - a).days == 1:
            cur += 1
        else:
            streaks.append(cur)
            cur = 1
    streaks.append(cur)
    return len(days), len(streaks), max(streaks)


def test_user_streaks_python_replay(spark):
    """The island key (ordinal - row_number) vs a plain consecutive-day
    scan in python over the same parquet — no SQL engine on the
    reference side."""
    from ubeardw_databricks_lakehouse_spark.plans.events_q import (
        q_user_streaks,
    )

    got = {
        r["user_id"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"])
        for r in q_user_streaks(spark, SF_DIR).collect()
    }
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    want = {
        uid: _python_streaks(list(g.unique()))
        for uid, g in ev.groupby("user_id")["day"]
    }
    assert got == want


def test_gini_revenue_python_replay(spark):
    """Gini rank formula vs a direct pandas replay on the same parquet."""
    from ubeardw_databricks_lakehouse_spark.plans.relational import (
        q_gini_revenue,
    )

    got = {
        r["segment"]: (r["n_customers"], r["gini"])
        for r in q_gini_revenue(spark, SF_DIR).collect()
    }
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for seg, g in j.groupby("c_mktsegment"):
        cents = (
            g.groupby("c_custkey")["o_totalprice"]
            .sum()
            .map(lambda v: round(v * 100))
            .sort_values()
            .tolist()
        )
        n, s = len(cents), sum(cents)
        s1 = sum(i * x for i, x in enumerate(cents, start=1))
        gini = float(2 * s1 - (n + 1) * s) / float(n * s)
        assert got[seg][0] == n
        assert got[seg][1] == pytest.approx(gini, abs=1e-12)
        assert 0.0 <= got[seg][1] < 1.0


def test_chisq_drift_python_replay(spark):
    """Contingency chi-square vs a direct pandas replay (same binning,
    same DECIMAL(22,8)-rounded per-cell contributions)."""
    from decimal import Decimal

    from ubeardw_databricks_lakehouse_spark.plans.llm_q import (
        q_chisq_drift,
    )

    got = {r["source"]: r["chi2"] for r in q_chisq_drift(spark, SF_DIR).collect()}
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs["bucket"] = docs["n_chars"].map(
        lambda c: 0 if c < 150 else 1 if c < 250 else 2 if c < 350 else 3 if c < 450 else 4
    )
    cells = docs.groupby(["source", "bucket"]).size()
    rt = docs.groupby("source").size()
    ct = docs.groupby("bucket").size()
    n = float(len(docs))
    for src in rt.index:
        acc = Decimal(0)
        for b in ct.index:
            o = float(cells.get((src, b), 0))
            e = float(rt[src]) * float(ct[b]) / n
            acc += Decimal(repr(round((o - e) * (o - e) / e, 8)))
        assert got[src] == pytest.approx(float(acc), abs=1e-12)


def test_copurchase_scores_bounded_and_symmetric_counts(spark):
    """n_both <= min(n_a, n_b) forces cosine and overlap into (0, 1];
    spot-check one pair's n_both by direct recount."""
    from ubeardw_databricks_lakehouse_spark.plans.relational import (
        q_copurchase_brands,
    )

    rows = q_copurchase_brands(spark, SF_DIR).collect()
    assert rows, "sf0.001 baskets must yield at least one brand pair"
    for r in rows:
        assert 0.0 < r["cosine_sim"] <= 1.0
        assert 0.0 < r["overlap_coef"] <= 1.0
        assert r["brand_a"] < r["brand_b"]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    ob = (
        li.merge(part, left_on="l_partkey", right_on="p_partkey")[
            ["l_orderkey", "p_brand"]
        ]
        .drop_duplicates()
    )
    a, b = rows[0]["brand_a"], rows[0]["brand_b"]
    oa = set(ob[ob.p_brand == a].l_orderkey)
    obr = set(ob[ob.p_brand == b].l_orderkey)
    assert rows[0]["n_both"] == len(oa & obr)
    assert rows[0]["n_both"] <= min(len(oa), len(obr))


def test_copurchase_no_cartesian_counts_broadcast(spark):
    from ubeardw_databricks_lakehouse_spark.plans.relational import (
        q_copurchase_brands,
    )

    plan = (
        q_copurchase_brands(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
