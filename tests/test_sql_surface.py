"""SQL entry point: UDF registration (U4) + item-level analytics."""

from __future__ import annotations

import pytest

from ubeardw_databricks_lakehouse_spark.pipelines.silver import silver_trip_events
from ubeardw_databricks_lakehouse_spark.plans.sql_surface import (
    item_level_analytics,
    register_sql_functions,
)
from ubeardw_databricks_lakehouse_spark.sources.debezium import to_bronze
from ubeardw_databricks_lakehouse_spark.testing.fixtures import raw_kafka_df


def test_sql_udf_registration(spark):
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT calculate_geohash(48.8566D, 2.3522D) AS gh, "
        "calculate_h3_index(48.8566D, 2.3522D) AS h3, "
        "get_timezone_from_coords(48.8566D, 2.3522D) AS tz, "
        "get_timezone_from_coords(55.0D, -3.0D) AS tz_uk, "
        "get_timezone_from_coords(NULL, NULL) AS tz_null"
    ).first()
    assert row.gh.startswith("u09")  # canonical Paris geohash prefix
    assert len(row.gh) == 8
    assert row.h3 is not None
    assert row.tz == "Europe/Paris"
    assert row.tz_uk == "Europe/London"
    assert row.tz_null == "UTC"


def test_item_level_analytics(spark):
    silver = silver_trip_events(
        to_bronze(raw_kafka_df(spark, "trip_events"), "trip_events")
    )
    out = {r.item_name: r for r in item_level_analytics(silver).collect()}
    # golden fixture: Steak Frites 1x22.00, Salade 1x8.50, Sushi Platter
    # 1x45.00, Plat du Jour 2x(null price)
    assert float(out["Steak Frites"].gross_revenue) == 22.00
    assert float(out["Sushi Platter"].gross_revenue) == 45.00
    assert out["Plat du Jour"].total_quantity == 2
    assert out["Plat du Jour"].gross_revenue is None  # price absent in payload
    assert out["Salade"].n_merchants == 1
