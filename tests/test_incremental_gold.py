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
