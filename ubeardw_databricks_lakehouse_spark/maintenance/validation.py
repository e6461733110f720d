"""Post-batch gold validation suite (port of the reference's
expectations/data_quality_validation.py, run as the batch job's third
task — jobs/batch_job.json:54-76).

Checks per table: null PKs, domain membership, value ranges,
referential integrity (left-anti join), exact static-dim
cardinalities. The reference's dim_date assertion of 3,653 rows
contradicts its own generator (4,018 for 2020-2030 inclusive); the
rebuild asserts 4,018 (SURVEY.md §4, BASELINE.md discrepancy note).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..storage.lakehouse import Lakehouse

VALID_LOYALTY = ["bronze", "silver", "gold", "platinum"]
EXPECTED_DIM_DATE = 4018
EXPECTED_DIM_TIME = 1440


def _result(table: str, checks: dict[str, bool], counts: dict[str, int]) -> dict:
    return {
        "table": table,
        "checks": checks,
        "counts": counts,
        "status": "PASS" if all(checks.values()) else "FAIL",
    }


def validate_dim_eater(lake: Lakehouse) -> dict:
    df = lake.read("dim_eater")
    total = df.count()
    nulls = df.filter(F.col("eater_id").isNull()).count()
    bad_tier = df.filter(~F.col("loyalty_tier").isin(VALID_LOYALTY)).count()
    return _result(
        "dim_eater",
        {"has_rows": total > 0, "no_null_pk": nulls == 0, "valid_tiers": bad_tier == 0},
        {"total": total, "current": df.filter("is_current").count()},
    )


def validate_dim_merchant(lake: Lakehouse) -> dict:
    df = lake.read("dim_merchant")
    total = df.count()
    nulls = df.filter(F.col("merchant_id").isNull()).count()
    bad_rating = df.filter(
        F.col("overall_rating").isNotNull()
        & ~F.col("overall_rating").between(0, 5)
    ).count()
    return _result(
        "dim_merchant",
        {"has_rows": total > 0, "no_null_pk": nulls == 0, "valid_ratings": bad_rating == 0},
        {"total": total, "current": df.filter("is_current").count()},
    )


def validate_dim_courier(lake: Lakehouse) -> dict:
    df = lake.read("dim_courier")
    total = df.count()
    nulls = df.filter(F.col("courier_id").isNull()).count()
    bad_rate = df.filter(
        F.col("on_time_delivery_rate").isNotNull()
        & ~F.col("on_time_delivery_rate").between(0, 100)
    ).count()
    return _result(
        "dim_courier",
        {"has_rows": total > 0, "no_null_pk": nulls == 0, "valid_rates": bad_rate == 0},
        {"total": total, "current": df.filter("is_current").count()},
    )


def validate_dim_location(lake: Lakehouse) -> dict:
    df = lake.read("dim_location")
    total = df.count()
    nulls = df.filter(F.col("location_id").isNull()).count()
    bad_coords = df.filter(
        ~F.col("latitude").between(-90, 90) | ~F.col("longitude").between(-180, 180)
    ).count()
    null_geohash = df.filter(F.col("geohash").isNull()).count()
    return _result(
        "dim_location",
        {
            "has_rows": total > 0,
            "no_null_pk": nulls == 0,
            "valid_coordinates": bad_coords == 0,
            "has_geohash": null_geohash == 0,
        },
        {"total": total},
    )


def validate_trip_fact(lake: Lakehouse) -> dict:
    df = lake.read("trip_fact")
    total = df.count()
    null_pk = df.filter(F.col("trip_id").isNull()).count()
    null_fk = df.filter(
        F.col("eater_id").isNull() | F.col("merchant_id").isNull()
    ).count()
    negative = df.filter(
        (F.col("total_amount") < 0) | (F.col("subtotal_amount") < 0)
    ).count()
    # referential integrity: facts must reference a current dim_eater row
    current_eaters = lake.read("dim_eater").filter("is_current").select("eater_id")
    orphans = df.join(current_eaters, "eater_id", "left_anti").count()
    return _result(
        "trip_fact",
        {
            "has_rows": total > 0,
            "no_null_pk": null_pk == 0,
            "no_null_fk": null_fk == 0,
            "no_negative_amounts": negative == 0,
            "referential_integrity": orphans == 0,
        },
        {"total": total, "orphans": orphans},
    )


def validate_static_dims(lake: Lakehouse) -> list[dict]:
    out = []
    n_dates = lake.read("dim_date").count()
    out.append(
        _result("dim_date", {"cardinality": n_dates == EXPECTED_DIM_DATE},
                {"total": n_dates})
    )
    n_times = lake.read("dim_time").count()
    out.append(
        _result("dim_time", {"cardinality": n_times == EXPECTED_DIM_TIME},
                {"total": n_times})
    )
    return out


def validate_gold(lake: Lakehouse, raise_on_failure: bool = False) -> dict:
    results = [
        validate_dim_eater(lake),
        validate_dim_merchant(lake),
        validate_dim_courier(lake),
        validate_dim_location(lake),
        validate_trip_fact(lake),
        *validate_static_dims(lake),
    ]
    failed = [r["table"] for r in results if r["status"] == "FAIL"]
    summary = {
        "tables": {r["table"]: r for r in results},
        "passed": len(results) - len(failed),
        "failed": len(failed),
        "status": "PASS" if not failed else "FAIL",
    }
    if failed and raise_on_failure:
        raise AssertionError(f"gold validation failed for: {failed}")
    return summary
