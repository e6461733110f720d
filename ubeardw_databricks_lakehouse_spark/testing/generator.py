"""Deterministic synthetic CDC generator — the reference's local-stack
data pattern (local_stack/generate_data.sql: randomized entities +
trip-event lifecycles + CDC-exercising UPDATEs) at configurable volume,
seeded for reproducibility.
"""

from __future__ import annotations

import json
import random

CITIES = [
    ("Paris", "Ile-de-France", "75001"),
    ("Paris", "Ile-de-France", "75008"),
    ("Paris", "Ile-de-France", "75009"),
    ("Lyon", "Auvergne-Rhone-Alpes", "69002"),
    ("Marseille", "Provence-Alpes-Cote", "13006"),
]
CUISINES = ["french", "japanese", "italian", "american", "mexican",
            "mediterranean", "indian"]
VEHICLES = ["bicycle", "scooter", "motorcycle", "car"]
LIFECYCLE = [
    "order_placed", "order_accepted", "courier_dispatched",
    "pickup_arrived", "pickup_completed", "dropoff_arrived", "delivered",
]
BASE_MS = 1_733_050_000_000  # 2024-12-01-ish


def generate(
    n_eaters: int = 200,
    n_merchants: int = 50,
    n_couriers: int = 100,
    n_trips: int = 2000,
    cancel_rate: float = 0.1,
    seed: int = 7,
) -> dict[str, list[dict]]:
    rng = random.Random(seed)
    eaters = []
    for i in range(1, n_eaters + 1):
        city, sp, pc = CITIES[rng.randrange(len(CITIES))]
        eaters.append(dict(
            eater_id=i, eater_uuid=f"e-{i:05d}", first_name=f"First{i}",
            last_name=f"Last{i}", email=f"user{i}@example.com",
            phone_number=f"+336{i:08d}", address_line_1=f"{i} Rue Example",
            address_line_2=None, city=city, state_province=sp,
            postal_code=pc, country="France",
            default_payment_method=rng.choice(
                ["credit_card", "paypal", "apple_pay", "google_pay"]),
            is_active=True, created_at=BASE_MS, updated_at=BASE_MS,
        ))
    merchants = []
    for i in range(1, n_merchants + 1):
        city, sp, pc = CITIES[rng.randrange(len(CITIES))]
        merchants.append(dict(
            merchant_id=i, merchant_uuid=f"m-{i:05d}", name=f"Merchant {i}",
            email=f"m{i}@example.com", phone_number=f"+331{i:08d}",
            business_type="restaurant", cuisine_type=rng.choice(CUISINES),
            address_line_1=f"{i} Avenue Marche", address_line_2=None,
            city=city, state_province=sp, postal_code=pc, country="France",
            operating_hours='{"monday": "11:00-22:00"}', is_active=True,
            created_at=BASE_MS, updated_at=BASE_MS,
        ))
    couriers = []
    for i in range(1, n_couriers + 1):
        couriers.append(dict(
            courier_id=i, courier_uuid=f"c-{i:05d}", first_name=f"CFirst{i}",
            last_name=f"CLast{i}", email=f"c{i}@ubear.example",
            phone_number=f"+337{i:08d}", vehicle_type=rng.choice(VEHICLES),
            license_plate=f"AB-{i:03d}-CD", is_active=True,
            onboarding_date="2024-01-15", created_at=BASE_MS, updated_at=BASE_MS,
        ))

    events = []
    eid = 0
    for trip in range(1, n_trips + 1):
        eater = rng.randrange(1, n_eaters + 1)
        merchant = rng.randrange(1, n_merchants + 1)
        courier = rng.randrange(1, n_couriers + 1)
        t0 = BASE_MS + trip * 60_000
        total = round(rng.uniform(10, 120), 2)
        cancelled = rng.random() < cancel_rate
        steps = LIFECYCLE[: rng.randrange(2, 8)] if cancelled else LIFECYCLE
        for step_idx, etype in enumerate(steps):
            eid += 1
            ts = t0 + step_idx * 120_000
            payload: dict = {}
            if etype == "order_placed":
                payload = {
                    "subtotal_amount": round(total * 0.8, 2),
                    "delivery_fee": 3.5, "service_fee": 2.0,
                    "tax_amount": round(total * 0.1, 2),
                    "total_amount": total,
                    "items": [{"name": f"Dish {merchant}", "price": round(total * 0.8, 2),
                               "quantity": 1}],
                }
            elif etype == "delivered":
                payload = {
                    "delivery_time_minutes": rng.randrange(8, 45),
                    "eater_rating": rng.randrange(1, 6),
                    "courier_rating": rng.randrange(1, 6),
                    "merchant_rating": rng.randrange(1, 6),
                    "tip_amount": round(rng.uniform(0, 10), 2),
                    "distance_miles": round(rng.uniform(0.5, 8), 2),
                }
            events.append(dict(
                event_id=eid, trip_id=f"trip-{trip:06d}",
                order_id=f"order-{trip:06d}", eater_id=eater,
                merchant_id=merchant,
                courier_id=courier if step_idx >= 2 else None,
                event_type=etype, event_time=ts,
                payload=json.dumps(payload), created_at=ts,
            ))
        if cancelled:
            eid += 1
            events.append(dict(
                event_id=eid, trip_id=f"trip-{trip:06d}",
                order_id=f"order-{trip:06d}", eater_id=eater,
                merchant_id=merchant, courier_id=None,
                event_type="cancelled",
                event_time=t0 + len(steps) * 120_000,
                payload=json.dumps({"cancellation_reason": "cancelled_by_eater"}),
                created_at=t0 + len(steps) * 120_000,
            ))

    return {
        "eater": eaters,
        "merchant": merchants,
        "courier": couriers,
        "trip_events": events,
    }


def with_updates(rows: list[dict], n_updates: int, mutate, seed: int = 11) -> list[dict]:
    """Return update-rows for a random subset (CDC 'u' wave)."""
    rng = random.Random(seed)
    picked = rng.sample(rows, n_updates)
    out = []
    for r in picked:
        u = dict(r)
        mutate(u, rng)
        u["updated_at"] = (u.get("updated_at") or BASE_MS) + 3_600_000
        out.append(u)
    return out
