"""Incremental trip_fact: events arriving in micro-batches that split
trips mid-lifecycle must converge to the exact daily-batch answer."""

from __future__ import annotations

import os

import pytest

from ubeardw_databricks_lakehouse_spark.pipelines.gold import (
    build_dim_location,
    build_trip_fact,
)
from ubeardw_databricks_lakehouse_spark.pipelines.silver import (
    silver_eater,
    silver_merchant,
    silver_trip_events,
)
from ubeardw_databricks_lakehouse_spark.sources.debezium import to_bronze
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
from ubeardw_databricks_lakehouse_spark.streaming.incremental_gold import (
    start_incremental_trip_fact,
)
from ubeardw_databricks_lakehouse_spark.testing.fixtures import (
    TRIP_EVENTS,
    raw_kafka_df,
)


def test_incremental_fact_converges_to_batch(spark, tmp_path):
    eater = silver_eater(to_bronze(raw_kafka_df(spark, "eater"), "eater"))
    merchant = silver_merchant(to_bronze(raw_kafka_df(spark, "merchant"), "merchant"))
    dim_loc = build_dim_location(eater, merchant)
    full_silver = silver_trip_events(
        to_bronze(raw_kafka_df(spark, "trip_events"), "trip_events")
    )

    # silver lands as a parquet table (what the streaming silver writes)
    silver_path = str(tmp_path / "silver_trip_events")
    full_silver.write.parquet(silver_path)

    # events arrive in 2 waves SPLIT MID-TRIP: wave1 = first 4 events of
    # trip-001 + trip-003 complete; wave2 = the rest
    stream_src = tmp_path / "waves"
    stream_src.mkdir()
    wave1_ids = {1, 2, 3, 4, 15, 16, 17}
    ev1 = [e for e in TRIP_EVENTS if e["event_id"] in wave1_ids]
    ev2 = [e for e in TRIP_EVENTS if e["event_id"] not in wave1_ids]

    lake = Lakehouse(spark, str(tmp_path / "gold"))
    silver_schema = spark.read.parquet(silver_path).schema

    def run_wave(events, n):
        src = tmp_path / f"w{n}"
        src.mkdir()
        silver_trip_events(
            to_bronze(raw_kafka_df(spark, "trip_events", rows=events), "trip_events")
        ).write.parquet(str(src / "data"))
        stream = spark.readStream.schema(silver_schema).parquet(str(src / "data"))
        q = start_incremental_trip_fact(
            spark,
            stream,
            silver_path,
            eater,
            merchant,
            dim_loc,
            lake,
            checkpoint=str(tmp_path / f"ck{n}"),
        )
        q.awaitTermination()

    run_wave(ev1, 1)
    mid = {r.trip_id: r for r in lake.read("trip_fact").collect()}
    # after wave 1 both touched trips exist; trip-001 only has 4 events
    # in the wave but was recomputed from FULL silver -> already complete
    assert set(mid) == {"trip-001", "trip-003"}
    assert mid["trip-001"].trip_status == "completed"

    run_wave(ev2, 2)
    final = {r.trip_id: r for r in lake.read("trip_fact").collect()}
    assert set(final) == {"trip-001", "trip-002", "trip-003"}

    # exact convergence with the batch build
    batch = {
        r.trip_id: r
        for r in build_trip_fact(
            spark.read.parquet(silver_path), eater, merchant, dim_loc
        ).collect()
    }
    for trip_id, b in batch.items():
        f = final[trip_id]
        assert f.trip_status == b.trip_status
        assert f.total_amount == b.total_amount
        assert f.updated_at == b.updated_at
        assert f.region_partition == b.region_partition


def test_incremental_scd2_matches_batch_history(spark, tmp_path):
    """CDC waves folded through foreachBatch SCD2 == batch apply_scd2
    applied snapshot-by-snapshot: same versions, currency, end dates."""
    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.operators.scd2 import apply_scd2
    from ubeardw_databricks_lakehouse_spark.streaming.incremental_gold import (
        start_incremental_scd2,
    )

    schema = "id int, name string, city string, cdc_ts string"
    def ts(df):
        return df.withColumn(
            "cdc_timestamp", F.to_timestamp("cdc_ts")
        ).drop("cdc_ts")

    wave1 = spark.createDataFrame(
        [
            (1, "alice", "paris", "2024-01-01 10:00:00"),
            (1, "alice", "lyon", "2024-01-01 11:00:00"),  # intra-batch: latest wins
            (2, "bob", "nice", "2024-01-01 10:30:00"),
        ],
        schema,
    )
    wave1 = ts(wave1)
    wave2 = spark.createDataFrame(
        [
            (1, "alice", "marseille", "2024-01-02 09:00:00"),
            (3, "carol", "toulouse", "2024-01-02 09:30:00"),
        ],
        schema,
    )
    wave2 = ts(wave2)

    def run_wave(df, n, lake):
        src = tmp_path / f"scd_w{n}"
        df.write.parquet(str(src))
        stream = spark.readStream.schema(df.schema).parquet(str(src))
        q = start_incremental_scd2(
            spark, stream, lake, "dim_stream", ["id"], ["name", "city"],
            checkpoint=str(tmp_path / f"scd_ck{n}"),
        )
        q.awaitTermination()

    stream_lake = __import__(
        "ubeardw_databricks_lakehouse_spark.storage.lakehouse",
        fromlist=["Lakehouse"],
    ).Lakehouse(spark, str(tmp_path / "stream_gold"))
    run_wave(wave1, 1, stream_lake)
    run_wave(wave2, 2, stream_lake)

    batch_lake = __import__(
        "ubeardw_databricks_lakehouse_spark.storage.lakehouse",
        fromlist=["Lakehouse"],
    ).Lakehouse(spark, str(tmp_path / "batch_gold"))
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"])
        .Window.partitionBy("id").orderBy(F.col("cdc_timestamp").desc())
    )
    for df, eff in [(wave1, "2024-01-01 11:00:00"), (wave2, "2024-01-02 09:30:00")]:
        snap = df.withColumn("_rn", w).where("_rn = 1").drop("_rn", "cdc_timestamp")
        apply_scd2(batch_lake, "dim_stream", snap, ["id"], ["name", "city"],
                   surrogate_name="sk", effective_ts=eff)

    cols = ["id", "name", "city", "version_number", "is_current",
            "effective_start_date", "effective_end_date"]
    got = sorted(
        stream_lake.read("dim_stream").select(cols).collect(),
        key=lambda r: (r["id"], r["version_number"]),
    )
    want = sorted(
        batch_lake.read("dim_stream").select(cols).collect(),
        key=lambda r: (r["id"], r["version_number"]),
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # intra-batch latest-wins: wave1 left alice at lyon, v1
    alice = {r["version_number"]: r for r in got if r["id"] == 1}
    assert alice[1]["city"] == "lyon" and alice[2]["city"] == "marseille"
    assert not alice[1]["is_current"] and alice[2]["is_current"]
