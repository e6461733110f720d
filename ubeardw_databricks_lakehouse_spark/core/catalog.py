"""Declarative table catalog — the config-driven spec layer.

SURVEY.md §7's design stance: "config-driven table specs (schema, keys,
expectations, partitioning, z-order cols) so the 4-entity pipeline
generalizes". This module is that single declaration point: adding a
5th CDC entity or a new gold table means adding a spec here — the
streaming pipeline, silver builders, maintenance pass, and validation
all consume these specs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql.types import StructType

from ..expectations.rules import SILVER_RULES, Rule
from .schemas import AFTER_SCHEMAS, ENTITY_PRIMARY_KEYS


@dataclass(frozen=True)
class EntitySpec:
    """One CDC entity: wire schema, keys, quality rules, stream config."""

    name: str
    after_schema: StructType
    primary_key: str
    expectations: list[Rule] = field(default_factory=list)
    watermark: str = "1 hour"

    @property
    def topic(self) -> str:
        return f"ubear.public.{self.name}"


@dataclass(frozen=True)
class GoldTableSpec:
    """One warehouse table: layout + maintenance configuration."""

    name: str
    partition_by: tuple[str, ...] = ()
    zorder_by: tuple[str, ...] = ()
    scd2_business_keys: tuple[str, ...] = ()
    scd2_compare_columns: tuple[str, ...] = ()
    merge_keys: tuple[str, ...] = ()
    merge_guard: str | None = None


def _entity(name: str) -> EntitySpec:
    return EntitySpec(
        name=name,
        after_schema=AFTER_SCHEMAS[name],
        primary_key=ENTITY_PRIMARY_KEYS[name],
        expectations=SILVER_RULES.get(name, []),
    )


ENTITIES: dict[str, EntitySpec] = {
    n: _entity(n) for n in ("eater", "merchant", "courier", "trip_events")
}


def _gold_specs() -> dict[str, GoldTableSpec]:
    from ..pipelines.gold import (
        COURIER_COMPARE_COLS,
        EATER_COMPARE_COLS,
        MERCHANT_COMPARE_COLS,
    )

    return {
        "dim_eater": GoldTableSpec(
            "dim_eater",
            zorder_by=("eater_id",),
            scd2_business_keys=("eater_id",),
            scd2_compare_columns=tuple(EATER_COMPARE_COLS),
        ),
        "dim_merchant": GoldTableSpec(
            "dim_merchant",
            zorder_by=("merchant_id",),
            scd2_business_keys=("merchant_id",),
            scd2_compare_columns=tuple(MERCHANT_COMPARE_COLS),
        ),
        "dim_courier": GoldTableSpec(
            "dim_courier",
            zorder_by=("courier_id",),
            scd2_business_keys=("courier_id",),
            scd2_compare_columns=tuple(COURIER_COMPARE_COLS),
        ),
        "dim_location": GoldTableSpec(
            "dim_location",
            partition_by=("region_zone",),
            zorder_by=("location_id", "region_zone"),
        ),
        "dim_date": GoldTableSpec("dim_date", zorder_by=("date_key",)),
        "dim_time": GoldTableSpec("dim_time", zorder_by=("time_key",)),
        "trip_fact": GoldTableSpec(
            "trip_fact",
            partition_by=("date_partition", "region_partition"),
            zorder_by=("order_placed_at", "eater_id", "merchant_id", "courier_id"),
            merge_keys=("trip_id",),
            merge_guard="source.updated_at > target.updated_at",
        ),
    }


GOLD_TABLES: dict[str, GoldTableSpec] = _gold_specs()
