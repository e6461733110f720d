"""Schema registry — every fixed schema in the engine, as code.

The reference declares all schemas explicitly (no inference):
StructType literals for the Kafka/Debezium layer (reference:
pipelines/bronze_pipeline.py:16-103) and the Silver payload
(pipelines/silver_pipeline.py:51-80), SQL DDL for Gold
(databricks_DW/02_create_tables.sql). This module is the single source
of truth for the rebuild.

Money policy: the reference parses money as DoubleType but declares
DECIMAL(12,2) in the DW DDL (SURVEY.md §1.2). We standardize on
DecimalType(12,2) at the Gold layer and keep DoubleType at the Silver
parse layer (matching wire reality), casting at the Gold boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Source OLTP entity schemas as they appear inside the Debezium `after` image
# (epoch-millis longs for timestamps; reference: bronze_pipeline.py:16-79,
# gcp_infrastructure/init_cloud_sql.sql:16-94).
# ---------------------------------------------------------------------------

EATER_AFTER_SCHEMA = StructType(
    [
        _f("eater_id", IntegerType()),
        _f("eater_uuid", StringType()),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("email", StringType()),
        _f("phone_number", StringType()),
        _f("address_line_1", StringType()),
        _f("address_line_2", StringType()),
        _f("city", StringType()),
        _f("state_province", StringType()),
        _f("postal_code", StringType()),
        _f("country", StringType()),
        _f("default_payment_method", StringType()),
        _f("is_active", BooleanType()),
        _f("created_at", LongType()),
        _f("updated_at", LongType()),
    ]
)

MERCHANT_AFTER_SCHEMA = StructType(
    [
        _f("merchant_id", IntegerType()),
        _f("merchant_uuid", StringType()),
        _f("name", StringType()),
        _f("email", StringType()),
        _f("phone_number", StringType()),
        _f("business_type", StringType()),
        _f("cuisine_type", StringType()),
        _f("address_line_1", StringType()),
        _f("address_line_2", StringType()),
        _f("city", StringType()),
        _f("state_province", StringType()),
        _f("postal_code", StringType()),
        _f("country", StringType()),
        _f("operating_hours", StringType()),  # JSONB carried opaque
        _f("is_active", BooleanType()),
        _f("created_at", LongType()),
        _f("updated_at", LongType()),
    ]
)

COURIER_AFTER_SCHEMA = StructType(
    [
        _f("courier_id", IntegerType()),
        _f("courier_uuid", StringType()),
        _f("first_name", StringType()),
        _f("last_name", StringType()),
        _f("email", StringType()),
        _f("phone_number", StringType()),
        _f("vehicle_type", StringType()),
        _f("license_plate", StringType()),
        _f("is_active", BooleanType()),
        _f("onboarding_date", StringType()),  # 'YYYY-MM-DD', cast to date in bronze
        _f("created_at", LongType()),
        _f("updated_at", LongType()),
    ]
)

TRIP_EVENTS_AFTER_SCHEMA = StructType(
    [
        _f("event_id", IntegerType()),
        _f("trip_id", StringType()),
        _f("order_id", StringType()),
        _f("eater_id", IntegerType()),
        _f("merchant_id", IntegerType()),
        _f("courier_id", IntegerType()),
        _f("event_type", StringType()),
        _f("event_time", LongType()),
        _f("payload", StringType()),  # sparse JSON, parsed in silver
        _f("created_at", LongType()),
    ]
)

AFTER_SCHEMAS: dict[str, StructType] = {
    "eater": EATER_AFTER_SCHEMA,
    "merchant": MERCHANT_AFTER_SCHEMA,
    "courier": COURIER_AFTER_SCHEMA,
    "trip_events": TRIP_EVENTS_AFTER_SCHEMA,
}

# ---------------------------------------------------------------------------
# Debezium envelope (reference: bronze_pipeline.py:84-103). `after` is kept
# as a raw JSON string and parsed with the per-entity schema above.
# ---------------------------------------------------------------------------

DEBEZIUM_SOURCE_SCHEMA = StructType(
    [
        _f("version", StringType()),
        _f("connector", StringType()),
        _f("name", StringType()),
        _f("ts_ms", LongType()),
        _f("snapshot", StringType()),
        _f("db", StringType()),
        _f("schema", StringType()),
        _f("table", StringType()),
        _f("txId", LongType()),
        _f("lsn", LongType()),
    ]
)

DEBEZIUM_PAYLOAD_SCHEMA = StructType(
    [
        _f("before", StringType()),
        _f("after", StringType()),
        _f("source", DEBEZIUM_SOURCE_SCHEMA),
        _f("op", StringType()),
        _f("ts_ms", LongType()),
    ]
)

DEBEZIUM_ENVELOPE_SCHEMA = StructType([_f("payload", DEBEZIUM_PAYLOAD_SCHEMA)])

# ---------------------------------------------------------------------------
# Silver trip_events payload schema (reference: silver_pipeline.py:51-80).
# Money is DoubleType at parse time; Gold casts to DECIMAL(12,2).
# ---------------------------------------------------------------------------

TRIP_PAYLOAD_SCHEMA = StructType(
    [
        _f("subtotal_amount", DoubleType()),
        _f("delivery_fee", DoubleType()),
        _f("service_fee", DoubleType()),
        _f("tax_amount", DoubleType()),
        _f("tip_amount", DoubleType()),
        _f("total_amount", DoubleType()),
        _f("courier_payout", DoubleType()),
        _f("discount_amount", DoubleType()),
        _f("distance_miles", DoubleType()),
        _f("total_distance_miles", DoubleType()),
        _f("courier_distance_miles", DoubleType()),
        _f("preparation_time_minutes", IntegerType()),
        _f("estimated_prep_time_minutes", IntegerType()),
        _f("actual_prep_time_minutes", IntegerType()),
        _f("delivery_time_minutes", IntegerType()),
        _f("total_time_minutes", IntegerType()),
        _f("trip_status", StringType()),
        _f("is_group_order", BooleanType()),
        _f("promo_code", StringType()),
        _f("eater_rating", IntegerType()),
        _f("courier_rating", IntegerType()),
        _f("merchant_rating", IntegerType()),
        _f("weather_condition", StringType()),
        _f(
            "items",
            ArrayType(
                StructType(
                    [
                        _f("name", StringType()),
                        _f("price", DoubleType()),
                        _f("quantity", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

# Trip lifecycle event vocabulary (reference: init_cloud_sql.sql:83).
TRIP_EVENT_TYPES = [
    "order_placed",
    "order_accepted",
    "courier_dispatched",
    "pickup_arrived",
    "pickup_completed",
    "dropoff_arrived",
    "delivered",
    "cancelled",
]

# Primary keys per entity (silver dedup + SCD2 business keys;
# reference: silver_pipeline.py:215,271,321).
ENTITY_PRIMARY_KEYS: dict[str, str] = {
    "eater": "eater_id",
    "merchant": "merchant_id",
    "courier": "courier_id",
    "trip_events": "event_id",
}

# Driver-provided synthetic testdata tables (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
