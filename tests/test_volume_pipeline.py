"""Moderate-volume end-to-end: 200 eaters / 50 merchants / 2,000 trips
(~13k CDC events) through bronze→silver→gold, then a CDC update wave
exercising SCD2 at volume (the reference's local-stack scenario,
local_stack/generate_data.sql, at 4x its size)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.pipelines.gold import run_gold_job
from ubeardw_databricks_lakehouse_spark.pipelines.silver import (
    silver_courier,
    silver_eater,
    silver_merchant,
    silver_trip_events,
)
from ubeardw_databricks_lakehouse_spark.sources.debezium import to_bronze
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
from ubeardw_databricks_lakehouse_spark.testing.fixtures import raw_kafka_df
from ubeardw_databricks_lakehouse_spark.testing.generator import (
    generate,
    with_updates,
)

N_TRIPS = 2000


@pytest.fixture(scope="module")
def data():
    return generate(n_trips=N_TRIPS)


def _silver(spark, data):
    return {
        "eater": silver_eater(
            to_bronze(raw_kafka_df(spark, "eater", rows=data["eater"]), "eater")
        ),
        "merchant": silver_merchant(
            to_bronze(raw_kafka_df(spark, "merchant", rows=data["merchant"]), "merchant")
        ),
        "courier": silver_courier(
            to_bronze(raw_kafka_df(spark, "courier", rows=data["courier"]), "courier")
        ),
        "trip_events": silver_trip_events(
            to_bronze(
                raw_kafka_df(spark, "trip_events", rows=data["trip_events"]),
                "trip_events",
            )
        ),
    }


def test_volume_gold_build_and_scd2_wave(spark, data, tmp_path):
    lake = Lakehouse(spark, str(tmp_path))
    silver = _silver(spark, data)

    t0 = time.perf_counter()
    counts = run_gold_job(
        lake,
        silver["eater"],
        silver["merchant"],
        silver["courier"],
        silver["trip_events"],
        effective_ts="2024-12-02 02:00:00",
    )
    build_s = time.perf_counter() - t0

    assert counts["dim_eater"] == 200
    assert counts["dim_merchant"] == 50
    assert counts["dim_courier"] == 100
    assert counts["trip_fact"] == N_TRIPS
    # every event row accounted for exactly once per trip
    fact = lake.read("trip_fact")
    statuses = {r.trip_status for r in fact.select("trip_status").distinct().collect()}
    assert "completed" in statuses and "cancelled" in statuses
    n_cancelled = fact.filter("trip_status = 'cancelled'").count()
    assert 100 < n_cancelled < 400  # ~10% cancel rate
    # completed trips have consistent durations
    bad_durations = fact.filter(
        (F.col("trip_status") == "completed") & (F.col("total_time_minutes") <= 0)
    ).count()
    assert bad_durations == 0
    # money defaults: no nulls anywhere in money columns
    assert fact.filter("total_amount IS NULL OR tip_amount IS NULL").count() == 0
    # the whole build should be minutes-not-hours locally
    assert build_s < 300, f"gold build took {build_s:.0f}s"

    # --- CDC update wave: 40 eaters move, 10 merchants rename ---
    def move(u, rng):
        u["address_line_1"] = f"{u['eater_id']} Rue Nouvelle"

    def rename(u, rng):
        u["name"] = f"{u['name']} (renamed)"

    updated_eaters = {r["eater_id"] for r in with_updates(data["eater"], 40, move)}
    new_eater_rows = [
        r for r in data["eater"] if r["eater_id"] not in updated_eaters
    ] + with_updates(data["eater"], 40, move)
    renamed = with_updates(data["merchant"], 10, rename, seed=13)
    renamed_ids = {r["merchant_id"] for r in renamed}
    new_merchant_rows = [
        r for r in data["merchant"] if r["merchant_id"] not in renamed_ids
    ] + renamed

    silver2 = dict(silver)
    silver2["eater"] = silver_eater(
        to_bronze(raw_kafka_df(spark, "eater", rows=new_eater_rows, op="u"), "eater")
    )
    silver2["merchant"] = silver_merchant(
        to_bronze(raw_kafka_df(spark, "merchant", rows=new_merchant_rows, op="u"), "merchant")
    )
    counts2 = run_gold_job(
        lake,
        silver2["eater"],
        silver2["merchant"],
        silver2["courier"],
        silver2["trip_events"],
        effective_ts="2024-12-03 02:00:00",
    )
    assert counts2["dim_eater"] == 240  # 200 + 40 new versions
    assert counts2["dim_merchant"] == 60  # 50 + 10 new versions
    assert counts2["trip_fact"] == N_TRIPS  # MERGE idempotent

    de = lake.read("dim_eater")
    assert de.filter("is_current").count() == 200
    assert de.filter("version_number = 2").count() == 40
    # expired rows closed with the new effective date
    assert (
        de.filter("version_number = 1 AND NOT is_current")
        .filter("effective_end_date IS NULL")
        .count()
        == 0
    )
