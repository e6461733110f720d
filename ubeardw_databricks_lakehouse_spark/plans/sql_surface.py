"""SQL entry point (SURVEY.md §3 entry point 3) — UDF registration,
view registration, and item-level analytics.

The reference registers its geo UDFs for SQL use (U4,
gold_pipeline.py:101-103) and declares — but never exploits — the
``items array<struct>`` payload column (§2.7 note: the DDL comments
promise item-level analytics). Both are first-class here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def register_sql_functions(spark: SparkSession) -> None:
    """spark.udf.register parity for the geo functions (U4).

    geohash/h3 register their pandas UDFs; the timezone function is a
    pure expression in DataFrame code (strictly faster) and registers a
    SQL-visible wrapper for surface parity.
    """
    from pyspark.sql.types import StringType

    from ..functions.geo import geohash8, h3_index

    spark.udf.register("calculate_geohash", geohash8)
    spark.udf.register("calculate_h3_index", h3_index)

    def _tz(lat, lon):
        if lat is not None and lon is not None:
            if 41.0 <= lat <= 51.5 and -5.0 <= lon <= 10.0:
                return "Europe/Paris"
            if 49.5 <= lat <= 61.0 and -8.0 <= lon <= 2.0:
                return "Europe/London"
        return "UTC"

    spark.udf.register("get_timezone_from_coords", _tz, StringType())


TIMEZONE_SQL_EXPR = """
CASE WHEN lat BETWEEN 41.0 AND 51.5 AND lon BETWEEN -5.0 AND 10.0 THEN 'Europe/Paris'
     WHEN lat BETWEEN 49.5 AND 61.0 AND lon BETWEEN -8.0 AND 2.0 THEN 'Europe/London'
     ELSE 'UTC' END
"""


def item_level_analytics(trip_events_silver: DataFrame) -> DataFrame:
    """Explode the order_placed items array -> item revenue rollup.

    One explode + one hash agg; the array lives only on order_placed
    rows, so the explode input is pre-filtered (no null-array blowup).
    """
    items = (
        trip_events_silver.filter(
            (F.col("event_type") == "order_placed") & F.col("items").isNotNull()
        )
        .select("trip_id", "merchant_id", F.explode("items").alias("item"))
        .select(
            "trip_id",
            "merchant_id",
            F.col("item.name").alias("item_name"),
            F.col("item.price").cast("decimal(12,2)").alias("item_price"),
            F.coalesce(F.col("item.quantity"), F.lit(1)).alias("quantity"),
        )
    )
    return items.groupBy("item_name").agg(
        F.count("*").alias("n_orders"),
        F.sum("quantity").alias("total_quantity"),
        F.sum(F.col("item_price") * F.col("quantity")).cast("decimal(14,2)").alias(
            "gross_revenue"
        ),
        F.count_distinct(F.col("merchant_id")).alias("n_merchants"),
    )
