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


def test_default_refresh_uses_watermark_no_double_count(spark, tmp_path):
    """Calling refresh with NO since_ts must never replay folded
    history: the seed records the CDF version it already contains, and
    every later default call folds only commits past the watermark —
    including the degenerate 'refresh twice with nothing new' case."""
    lake = Lakehouse(spark, str(tmp_path))
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 4.0)], "k long, grp string, amount double"
    )
    upsert_with_cdf(lake, "fact", b1, keys=["k"])
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    # no-op refresh: watermark says everything is folded already
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    assert _view(lake, "fact_by_grp") == _full(lake, "fact")

    b2 = spark.createDataFrame(
        [(1, "a", 25.0), (3, "c", 1.0)], "k long, grp string, amount double"
    )
    upsert_with_cdf(lake, "fact", b2, keys=["k"])
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    assert _view(lake, "fact_by_grp") == _full(lake, "fact")

    delete_where_with_cdf(lake, "fact", "k = 2")
    refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")
    got = _view(lake, "fact_by_grp")
    assert got == _full(lake, "fact")
    assert "b" not in got


def test_refresh_without_watermark_refuses_default(spark, tmp_path):
    """A view with no recorded watermark (e.g. seeded by an older
    build) must refuse a default refresh instead of silently replaying
    the whole CDF into it."""
    import pytest as _pytest

    lake = Lakehouse(spark, str(tmp_path))
    b1 = spark.createDataFrame([(1, "a", 10.0)], "k long, grp string, amount double")
    upsert_with_cdf(lake, "fact", b1, keys=["k"])
    # hand-built view without sidecar meta
    seed = lake.read("fact").groupBy("grp").agg(
        F.sum(F.col("amount").cast("decimal(18,2)")).cast("decimal(18,2)").alias("sum_value"),
        F.count("*").alias("n_rows"),
    )
    lake.overwrite("fact_by_grp", seed)
    with _pytest.raises(ValueError, match="watermark"):
        refresh_metric_view(lake, "fact_by_grp", "fact", ["grp"], "amount")


def test_streaming_fold_skips_replayed_batch(spark, tmp_path):
    """foreachBatch replay safety: a second stream on a FRESH
    checkpoint re-delivers the whole CDF as batch 0, which the view's
    batch-id ledger must skip — the view stays equal to the full
    recompute instead of doubling."""
    from ubeardw_databricks_lakehouse_spark.streaming.materialized import (
        stream_metric_view,
    )

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    b1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 4.0)], "k long, grp string, amount double"
    )
    upsert_with_cdf(lake, "fact", b1, keys=["k"])
    q = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                           "amount", str(tmp_path / "ckpt1"))
    q.awaitTermination(120)
    assert _view(lake, "fact_live") == _full(lake, "fact")

    # fresh checkpoint -> Spark replays every CDF file as batch 0
    q2 = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                            "amount", str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert _view(lake, "fact_live") == _full(lake, "fact")


def test_streaming_view_late_out_of_order_cdc(spark, tmp_path):
    """Late/out-of-order CDC equivalence: a stale update rejected by
    the merge guard emits no CDF rows (so the view must not move), and
    a late-arriving but guard-accepted update folds exactly once —
    after every drain the folded view equals the full recompute."""
    from ubeardw_databricks_lakehouse_spark.streaming.materialized import (
        stream_metric_view,
    )

    lake = Lakehouse(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")
    guard = "source.updated_at > target.updated_at"

    b1 = spark.createDataFrame(
        [(1, "a", 10.0, 5), (2, "b", 4.0, 5)],
        "k long, grp string, amount double, updated_at long",
    )
    upsert_with_cdf(lake, "fact", b1, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-05 00:00:00")
    q = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                           "amount", ckpt)
    q.awaitTermination(120)
    assert _view(lake, "fact_live") == _full(lake, "fact")

    # stale replay of k=1 (updated_at 3 < 5): guard rejects, CDF silent
    stale = spark.createDataFrame(
        [(1, "a", 999.0, 3)], "k long, grp string, amount double, updated_at long"
    )
    upsert_with_cdf(lake, "fact", stale, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-03 00:00:00")
    # late but NEWER by the event clock (updated_at 7, batch_ts in the past):
    # guard accepts; also moves k=2 into grp a (group transfer under lateness)
    late = spark.createDataFrame(
        [(2, "a", 6.0, 7)], "k long, grp string, amount double, updated_at long"
    )
    upsert_with_cdf(lake, "fact", late, keys=["k"], update_condition=guard,
                    batch_ts="2024-01-04 00:00:00")
    q2 = stream_metric_view(spark, lake, "fact_live", "fact", ["grp"],
                            "amount", ckpt)
    q2.awaitTermination(120)
    got = _view(lake, "fact_live")
    assert got == _full(lake, "fact")
    assert "b" not in got  # k=2 left grp b
