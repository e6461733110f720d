"""Golden micro-fixture: the reference's 3-trip / 18-event sample.

Reproduces gcp_infrastructure/init_cloud_sql.sql:140-223 as synthesized
Debezium envelopes (FIXTURES.md §6-7), so bronze/silver/gold tests run
the exact lifecycle the reference demos: trip-001 completed 44.00,
trip-002 completed 55.00, trip-003 cancelled 77.00.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

EPOCH_FMT = "%Y-%m-%d %H:%M:%S"


def _ms(ts: str) -> int:
    from datetime import datetime, timezone

    return int(
        datetime.strptime(ts, EPOCH_FMT).replace(tzinfo=timezone.utc).timestamp() * 1000
    )


EATERS = [
    dict(eater_id=i + 1, eater_uuid=f"eater-uuid-{i+1:03d}", first_name=fn,
         last_name=ln, email=em, phone_number=ph, address_line_1=a1,
         address_line_2=a2, city=city, state_province=sp, postal_code=pc,
         country="France", default_payment_method=pm, is_active=True,
         created_at=_ms("2024-01-01 00:00:00"), updated_at=_ms("2024-01-01 00:00:00"))
    for i, (fn, ln, em, ph, a1, a2, city, sp, pc, pm) in enumerate(
        [
            ("Alice", "Dupont", "alice.dupont@email.com", "+33612345678",
             "10 Rue de Rivoli", "Appartement 5B", "Paris", "Ile-de-France",
             "75001", "credit_card"),
            ("Bob", "Martin", "bob.martin@email.com", "+33623456789",
             "45 Avenue Montaigne", None, "Paris", "Ile-de-France", "75008",
             "paypal"),
            ("Claire", "Dubois", "claire.dubois@email.com", "+33634567890",
             "78 Boulevard Haussmann", "Etage 3", "Paris", "Ile-de-France",
             "75009", "apple_pay"),
            ("David", "Leroy", "david.leroy@email.com", "+33645678901",
             "23 Rue de Lyon", None, "Lyon", "Auvergne-Rhone-Alpes", "69002",
             "credit_card"),
            ("Emma", "Petit", "emma.petit@email.com", "+33656789012",
             "15 Cours Julien", "Apt 12", "Marseille", "Provence-Alpes-Cote",
             "13006", "google_pay"),
        ]
    )
]

MERCHANTS = [
    dict(merchant_id=i + 1, merchant_uuid=f"merchant-uuid-{i+1:03d}", name=nm,
         email=em, phone_number=ph, business_type="restaurant", cuisine_type=ct,
         address_line_1=a1, address_line_2=a2, city=city, state_province=sp,
         postal_code=pc, country="France",
         operating_hours='{"monday": "11:00-22:00"}', is_active=True,
         created_at=_ms("2024-01-01 00:00:00"), updated_at=_ms("2024-01-01 00:00:00"))
    for i, (nm, em, ph, ct, a1, a2, city, sp, pc) in enumerate(
        [
            ("Le Bistrot Parisien", "contact@bistrot-parisien.fr", "+33142345678",
             "french", "5 Rue Saint-Honore", None, "Paris", "Ile-de-France", "75001"),
            ("Sushi Tokyo", "info@sushitokyo.fr", "+33143456789", "japanese",
             "12 Avenue de l'Opera", "Local 2", "Paris", "Ile-de-France", "75002"),
            ("Pizza Napoli", "hello@pizzanapoli.fr", "+33144567890", "italian",
             "34 Rue de Belleville", None, "Paris", "Ile-de-France", "75020"),
            ("Bouchon Lyonnais", "contact@bouchon-lyon.fr", "+33478901234",
             "french", "8 Rue des Marronniers", None, "Lyon",
             "Auvergne-Rhone-Alpes", "69002"),
            ("Bouillabaisse Express", "info@bouillabaisse-express.fr",
             "+33491234567", "mediterranean", "20 Quai du Port", "Zone 1",
             "Marseille", "Provence-Alpes-Cote", "13002"),
        ]
    )
]

COURIERS = [
    dict(courier_id=i + 1, courier_uuid=f"courier-uuid-{i+1:03d}", first_name=fn,
         last_name=ln, email=em, phone_number=ph, vehicle_type=vt,
         license_plate=lp, is_active=True, onboarding_date=od,
         created_at=_ms("2024-01-01 00:00:00"), updated_at=_ms("2024-01-01 00:00:00"))
    for i, (fn, ln, em, ph, vt, lp, od) in enumerate(
        [
            ("Francois", "Moreau", "francois.moreau@ubear.com", "+33667890123",
             "bicycle", "N/A", "2024-01-15"),
            ("Sophie", "Blanc", "sophie.blanc@ubear.com", "+33678901234",
             "scooter", "AB-123-CD", "2024-02-01"),
            ("Lucas", "Roux", "lucas.roux@ubear.com", "+33689012345",
             "motorcycle", "EF-456-GH", "2024-03-10"),
            ("Marie", "Simon", "marie.simon@ubear.com", "+33690123456",
             "car", "IJ-789-KL", "2024-04-20"),
        ]
    )
]


def _trip_event(event_id, trip_id, order_id, eater_id, merchant_id, courier_id,
                event_type, ts, payload):
    return dict(
        event_id=event_id, trip_id=trip_id, order_id=order_id, eater_id=eater_id,
        merchant_id=merchant_id, courier_id=courier_id, event_type=event_type,
        event_time=_ms(ts), payload=json.dumps(payload), created_at=_ms(ts),
    )


TRIP_EVENTS = [
    # trip-001: full 7-event lifecycle -> completed, 44.00
    _trip_event(1, "trip-001", "order-001", 1, 1, None, "order_placed",
                "2024-12-01 12:00:00",
                {"subtotal_amount": 35.50, "delivery_fee": 3.50,
                 "service_fee": 2.00, "tax_amount": 3.00, "total_amount": 44.00,
                 "trip_status": "pending",
                 "items": [{"name": "Steak Frites", "quantity": 1, "price": 22.00},
                           {"name": "Salade", "quantity": 1, "price": 8.50}]}),
    _trip_event(2, "trip-001", "order-001", 1, 1, None, "order_accepted",
                "2024-12-01 12:02:00", {"estimated_prep_time_minutes": 15}),
    _trip_event(3, "trip-001", "order-001", 1, 1, 1, "courier_dispatched",
                "2024-12-01 12:10:00", {"courier_distance_miles": 1.55}),
    _trip_event(4, "trip-001", "order-001", 1, 1, 1, "pickup_arrived",
                "2024-12-01 12:15:00", {}),
    _trip_event(5, "trip-001", "order-001", 1, 1, 1, "pickup_completed",
                "2024-12-01 12:18:00", {"actual_prep_time_minutes": 16}),
    _trip_event(6, "trip-001", "order-001", 1, 1, 1, "dropoff_arrived",
                "2024-12-01 12:33:00", {}),
    _trip_event(7, "trip-001", "order-001", 1, 1, 1, "delivered",
                "2024-12-01 12:35:00",
                {"delivery_time_minutes": 17, "eater_rating": 5,
                 "courier_rating": 5, "merchant_rating": 4, "tip_amount": 5.00,
                 "distance_miles": 2.5}),
    # trip-002: complete -> completed, 55.00
    _trip_event(8, "trip-002", "order-002", 2, 2, None, "order_placed",
                "2024-12-01 18:30:00",
                {"subtotal_amount": 45.00, "delivery_fee": 4.00,
                 "service_fee": 2.50, "tax_amount": 3.50, "total_amount": 55.00,
                 "items": [{"name": "Sushi Platter", "quantity": 1, "price": 45.00}]}),
    _trip_event(9, "trip-002", "order-002", 2, 2, None, "order_accepted",
                "2024-12-01 18:32:00", {"estimated_prep_time_minutes": 20}),
    _trip_event(10, "trip-002", "order-002", 2, 2, 2, "courier_dispatched",
                "2024-12-01 18:45:00", {"courier_distance_miles": 1.12}),
    _trip_event(11, "trip-002", "order-002", 2, 2, 2, "pickup_arrived",
                "2024-12-01 18:52:00", {}),
    _trip_event(12, "trip-002", "order-002", 2, 2, 2, "pickup_completed",
                "2024-12-01 18:54:00", {"actual_prep_time_minutes": 22}),
    _trip_event(13, "trip-002", "order-002", 2, 2, 2, "dropoff_arrived",
                "2024-12-01 19:06:00", {}),
    _trip_event(14, "trip-002", "order-002", 2, 2, 2, "delivered",
                "2024-12-01 19:08:00",
                {"delivery_time_minutes": 14, "eater_rating": 5,
                 "courier_rating": 5, "merchant_rating": 5, "tip_amount": 8.00,
                 "distance_miles": 1.8, "weather_condition": "cloudy"}),
    # trip-003: cancelled, 77.00, PROMO10
    _trip_event(15, "trip-003", "order-003", 4, 4, None, "order_placed",
                "2024-12-01 17:00:00",
                {"subtotal_amount": 65.00, "delivery_fee": 4.50,
                 "service_fee": 2.50, "tax_amount": 5.00, "total_amount": 77.00,
                 "discount_amount": 10.00, "promo_code": "PROMO10",
                 "items": [{"name": "Plat du Jour", "quantity": 2}]}),
    _trip_event(16, "trip-003", "order-003", 4, 4, None, "order_accepted",
                "2024-12-01 17:02:00", {"estimated_prep_time_minutes": 18}),
    _trip_event(17, "trip-003", "order-003", 4, 4, None, "cancelled",
                "2024-12-01 17:05:00", {}),
]

ENTITY_ROWS = {
    "eater": EATERS,
    "merchant": MERCHANTS,
    "courier": COURIERS,
    "trip_events": TRIP_EVENTS,
}


def debezium_envelope(table: str, after: dict, op: str = "c", ts_ms: int = 0) -> str:
    return json.dumps(
        {
            "payload": {
                "before": None,
                "after": json.dumps(after),
                "source": {
                    "version": "2.5.4.Final",
                    "connector": "postgresql",
                    "name": "dbserver1",
                    "ts_ms": ts_ms,
                    "snapshot": "false",
                    "db": "ubear_dw",
                    "schema": "public",
                    "table": table,
                    "txId": 0,
                    "lsn": 0,
                },
                "op": op,
                "ts_ms": ts_ms,
            }
        }
    )


def raw_kafka_df(
    spark: SparkSession,
    entity: str,
    rows: list[dict] | None = None,
    op: str = "c",
    arrow: bool = True,
) -> DataFrame:
    """Kafka-record-shaped DataFrame (post project_kafka_record) for tests.

    Driver→JVM transfer goes through a pandas frame so the session's
    Arrow path applies (guide §6: orders of magnitude over pickled
    rows; measured 3x on the 13k-envelope gold-bench payload — the
    per-row type verification of the plain-tuples path is the cost).
    Falls back to the row path for empty input (no batch to convert).
    ``arrow=False`` keeps the pickled-row path — the A/B baseline arm
    for the SCALING.md gold-pipeline rung (r13 verdict #8); production
    code never sets it.
    """
    rows = rows if rows is not None else ENTITY_ROWS[entity]
    data = [
        (
            str(i),
            debezium_envelope(entity, r, op=op, ts_ms=r.get("updated_at", 0) or 0),
            f"ubear.public.{entity}",
            0,
            i,
            None,
        )
        for i, r in enumerate(rows)
    ]
    schema = (
        "kafka_key string, raw_value string, kafka_topic string, "
        "kafka_partition int, kafka_offset long, kafka_timestamp timestamp"
    )
    if data and arrow:
        import pandas as pd

        pdf = pd.DataFrame(
            data,
            columns=[
                "kafka_key", "raw_value", "kafka_topic",
                "kafka_partition", "kafka_offset", "kafka_timestamp",
            ],
        )
        pdf["kafka_timestamp"] = pd.to_datetime(pdf["kafka_timestamp"])
        return spark.createDataFrame(pdf, schema)
    return spark.createDataFrame(data, schema)
