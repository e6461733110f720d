"""End-to-end golden test: Debezium envelopes -> bronze -> silver -> gold.

Asserts the reference's own demo numbers (FIXTURES.md §7 /
init_cloud_sql.sql:169-223): trip-001 completed 44.00, trip-002
completed 55.00, trip-003 cancelled 77.00; dim_date 4,018; dim_time
1,440.
"""

from __future__ import annotations

import pytest

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


@pytest.fixture(scope="module")
def silver_tables(spark):
    return {
        "eater": silver_eater(to_bronze(raw_kafka_df(spark, "eater"), "eater")),
        "merchant": silver_merchant(
            to_bronze(raw_kafka_df(spark, "merchant"), "merchant")
        ),
        "courier": silver_courier(
            to_bronze(raw_kafka_df(spark, "courier"), "courier")
        ),
        "trip_events": silver_trip_events(
            to_bronze(raw_kafka_df(spark, "trip_events"), "trip_events")
        ),
    }


def test_bronze_parses_envelope(spark):
    bronze = to_bronze(raw_kafka_df(spark, "eater"), "eater")
    rows = bronze.collect()
    assert len(rows) == 5
    assert {r.cdc_operation for r in rows} == {"c"}
    assert rows[0].eater_id is not None


def test_silver_trip_events_payload_typed(silver_tables):
    te = silver_tables["trip_events"]
    assert te.count() == 17
    placed = te.filter(
        (te.trip_id == "trip-001") & (te.event_type == "order_placed")
    ).first()
    assert placed.total_amount == 44.00
    assert placed.subtotal_amount == 35.50
    assert len(placed.items) == 2


def test_silver_normalization(silver_tables):
    eater = silver_tables["eater"].filter("eater_id = 1").first()
    assert eater.email == "alice.dupont@email.com"
    assert eater.phone_number == "+33612345678"
    assert eater.country == "FRANCE"


def test_gold_star_schema(spark, silver_tables, tmp_path_factory):
    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("gold")))
    counts = run_gold_job(
        lake,
        silver_tables["eater"],
        silver_tables["merchant"],
        silver_tables["courier"],
        silver_tables["trip_events"],
        effective_ts="2024-12-02 02:00:00",
    )
    assert counts["dim_date"] == 4018
    assert counts["dim_time"] == 1440
    assert counts["dim_eater"] == 5
    assert counts["dim_merchant"] == 5
    assert counts["dim_courier"] == 4
    assert counts["trip_fact"] == 3

    fact = {r.trip_id: r for r in lake.read("trip_fact").collect()}
    assert fact["trip-001"].trip_status == "completed"
    assert float(fact["trip-001"].total_amount) == 44.00
    assert fact["trip-001"].total_time_minutes == 35.0
    assert fact["trip-002"].trip_status == "completed"
    assert float(fact["trip-002"].total_amount) == 55.00
    assert fact["trip-003"].trip_status == "cancelled"
    assert float(fact["trip-003"].total_amount) == 77.00
    assert float(fact["trip-003"].discount_amount) == 10.00
    assert fact["trip-003"].promo_code_used == "PROMO10"
    # region partitioning came from the dropoff location join
    assert fact["trip-001"].region_partition == "paris-region"
    assert fact["trip-003"].region_partition == "lyon-region"

    # fact upsert: re-running with the same inputs must not duplicate
    counts2 = run_gold_job(
        lake,
        silver_tables["eater"],
        silver_tables["merchant"],
        silver_tables["courier"],
        silver_tables["trip_events"],
        effective_ts="2024-12-03 02:00:00",
    )
    assert counts2["trip_fact"] == 3
    assert counts2["dim_eater"] == 5  # no changes -> no new SCD2 versions
