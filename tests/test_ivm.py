"""Incremental view maintenance: CDF-fed refresh == full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.storage.ivm import refresh_metric_view
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import (
    Lakehouse,
    delete_where_with_cdf,
    read_changes,
    upsert_with_cdf,
)


def _full(lake, base):
    return {
        r["grp"]: (str(r["sum_value"]), r["n_rows"])
        for r in lake.read(base)
        .groupBy("grp")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("sum_value"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }


def _view(lake, view):
    return {
        r["grp"]: (str(r["sum_value"]), r["n_rows"])
        for r in lake.read(view).collect()
    }


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path))
    guard = "source.updated_at > target.updated_at"

    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "a", 5.0, 1), (3, "b", 7.5, 1)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b1, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-01 00:00:00")
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    assert _view(lake, "fact_by_grp") == _full(lake, "fact")

    # wave 2: update k=2 (a: 5 -> 20), insert k=4 into new group c,
    # stale update of k=3 rejected by the guard (must not move the view)
    b2 = spark.createDataFrame(
        [(2, "a", 20.0, 2), (4, "c", 1.25, 1), (3, "b", 99.0, 0)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b2, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-02 00:00:00")
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount",
                        since_ts="2024-01-01 12:00:00")
    assert _view(lake, "fact_by_grp") == _full(lake, "fact")

    # wave 3: group b's only row moves to group a -> b must drop out
    b3 = spark.createDataFrame(
        [(3, "a", 7.5, 3)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b3, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-03 00:00:00")
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount",
                        since_ts="2024-01-02 12:00:00")
    got = _view(lake, "fact_by_grp")
    assert got == _full(lake, "fact")
    assert "b" not in got

    # wave 4: DELETE with CDF — view follows via delete rows only
    delete_where_with_cdf(lake, "fact", "k = 2", batch_ts="2024-01-04 00:00:00")
    dels = read_changes(lake, "fact", since_ts="2024-01-03 12:00:00").collect()
    assert [(r["k"], r["_change_type"]) for r in dels] == [(2, "delete")]
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount",
                        since_ts="2024-01-03 12:00:00")
    assert _view(lake, "fact_by_grp") == _full(lake, "fact")

    # DESCRIBE HISTORY twin: four commits, newest first, counts by op
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import table_history

    hist = table_history(lake, "fact").collect()
    assert len(hist) == 4
    assert [
        (r["n_inserted"], r["n_updated"], r["n_deleted"]) for r in hist
    ] == [(0, 0, 1), (0, 1, 0), (1, 1, 0), (3, 0, 0)]


def test_streaming_metric_view_tracks_cdf(spark, tmp_path):
    """Continuous IVM: the streaming view folds CDF micro-batches and
    converges to the full recompute after every drain, including a
    checkpointed restart that must process only NEW change files."""
    from ubeardw_databricks_lakehouse_spark.streaming.materialized import (
        stream_metric_view,
    )

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    guard = "source.updated_at > target.updated_at"

    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 4.0, 1)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b1, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-01 00:00:00")
    q = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                           "amount", ckpt)
    q.awaitTermination(120)
    assert _view(lake, "fact_live") == _full(lake, "fact")

    # more change waves, then a fresh stream on the SAME checkpoint
    b2 = spark.createDataFrame(
        [(1, "a", 25.0, 2), (3, "a", 1.0, 1)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b2, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-02 00:00:00")
    delete_where_with_cdf(lake, "fact", "k = 2", batch_ts="2024-01-03 00:00:00")
    q2 = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                            "amount", ckpt)
    q2.awaitTermination(120)
    got = _view(lake, "fact_live")
    assert got == _full(lake, "fact")
    assert "b" not in got  # deleted group dropped out
