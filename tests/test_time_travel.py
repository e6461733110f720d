"""Time travel via CDF reconstruction == snapshots taken along the way."""

from __future__ import annotations

from ubeardw_databricks_lakehouse_spark.storage.lakehouse import (
    Lakehouse,
    delete_where_with_cdf,
    read_as_of,
    upsert_with_cdf,
)


def _state(df):
    return {r["k"]: (r["v"], r["updated_at"]) for r in df.collect()}


def test_read_as_of_reconstructs_every_commit(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path))
    guard = "source.updated_at > target.updated_at"
    snapshots = {}

    waves = [
        ("2024-01-01 00:00:00", [(1, "a", 1), (2, "b", 1)], None),
        # update k=1, insert k=3
        ("2024-01-02 00:00:00", [(1, "a2", 2), (3, "c", 1)], None),
        # delete k=2
        ("2024-01-03 00:00:00", None, "k = 2"),
        # k=1 updated twice more in one logical day, k=2 REINSERTED
        ("2024-01-04 00:00:00", [(1, "a3", 3), (2, "b2", 4)], None),
    ]
    for ts, rows, del_cond in waves:
        if rows is not None:
            df = spark.createDataFrame(rows, "k long, v string, updated_at long")
            upsert_with_cdf(lake, "t", df, keys=["k"], update_condition=guard,
                            batch_ts=ts)
        if del_cond is not None:
            delete_where_with_cdf(lake, "t", del_cond, batch_ts=ts)
        snapshots[ts] = _state(lake.read("t"))

    # reconstruct the state as of just after each commit and compare
    # with the snapshot captured when that commit was live
    probes = {
        "2024-01-01 12:00:00": "2024-01-01 00:00:00",
        "2024-01-02 12:00:00": "2024-01-02 00:00:00",
        "2024-01-03 12:00:00": "2024-01-03 00:00:00",
        "2024-01-04 12:00:00": "2024-01-04 00:00:00",
    }
    for as_of, commit in probes.items():
        got = _state(read_as_of(lake, "t", ["k"], as_of))
        assert got == snapshots[commit], (as_of, got, snapshots[commit])


def test_read_as_of_deterministic_under_colliding_timestamps(spark, tmp_path):
    """Three commits sharing one batch_ts: commit order must come from
    the monotonic _commit_version, not the random _commit_id — the
    key's EARLIEST post-T change is its v1 insert, so the key did not
    exist at T and the reconstruction is empty (any other tie-break
    could surface a later preimage and resurrect value 'A')."""
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import (
        Lakehouse,
        read_as_of,
        upsert_with_cdf,
    )

    lake = Lakehouse(spark, str(tmp_path))
    ts = "2024-01-01 00:00:00"
    for val in ("A", "B", "C"):
        df = spark.createDataFrame([(1, val)], "k long, v string")
        upsert_with_cdf(lake, "t", df, keys=["k"], batch_ts=ts)
    cdf = lake.read("t__cdf")
    assert [r[0] for r in cdf.select("_commit_version").distinct().orderBy(
        "_commit_version").collect()] == [1, 2, 3]
    got = read_as_of(lake, "t", ["k"], "2023-12-31 00:00:00")
    assert got.count() == 0
