"""Data-quality expectations — a DLT shim on plain Structured Streaming.

The reference uses Databricks DLT decorators ``@dlt.expect`` (warn),
``@dlt.expect_or_drop``, ``@dlt.expect_or_fail`` (reference:
pipelines/silver_pipeline.py:98-99,179-181,234-236,290-292) plus a
declarative catalog (expectations/data_quality.py:12-288). Open-source
Spark has no DLT, so this module compiles the same rule vocabulary to:

- drop  -> ``df.filter(rule)`` (rows violating are removed);
- warn  -> violation counters via ``df.observe`` (no extra pass — the
  metrics ride the same job, batch or streaming);
- fail  -> observed counter checked after the action; raises.

Catalog note: the reference's merchant rules reference a
``merchant_name`` column that silver actually names ``name``
(data_quality.py:116 vs silver_pipeline.py:250) — fixed here, recorded
as an intentional divergence (SURVEY.md §4 hazards).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

Action = Literal["warn", "drop", "fail"]


@dataclass(frozen=True)
class Rule:
    name: str
    constraint: str  # SQL boolean expression; True = row passes
    action: Action = "warn"


class ExpectationFailed(Exception):
    pass


@dataclass
class AppliedExpectations:
    df: DataFrame
    observation: Observation | None
    fail_rules: list[Rule]
    warn_rules: list[Rule]
    #: rows the drop rules removed, annotated with ``_violated_rules``
    #: (parity with the reference's quarantine routing,
    #: expectations/data_quality.py:290-298). Lazy — costs nothing
    #: unless written somewhere; works on batch and streaming frames.
    quarantine: DataFrame | None = None

    def metrics(self) -> dict[str, int]:
        """Violation counts (valid after an action ran on ``df``)."""
        if self.observation is None:
            return {}
        return dict(self.observation.get)

    def raise_on_failures(self) -> None:
        got = self.metrics()
        bad = {
            r.name: got.get(f"violations_{r.name}", 0)
            for r in self.fail_rules
            if got.get(f"violations_{r.name}", 0) > 0
        }
        if bad:
            raise ExpectationFailed(f"expect_or_fail violated: {bad}")


def apply_expectations(df: DataFrame, rules: list[Rule]) -> AppliedExpectations:
    """Compile a rule set onto a DataFrame (batch or streaming)."""
    raw = df
    drop_rules = [r for r in rules if r.action == "drop"]
    warn_rules = [r for r in rules if r.action == "warn"]
    fail_rules = [r for r in rules if r.action == "fail"]

    observed = warn_rules + fail_rules
    obs = None
    if observed:
        import uuid

        metrics = [
            F.sum(
                F.when(~F.expr(r.constraint) | F.expr(r.constraint).isNull(), 1)
                .otherwise(0)
            ).alias(f"violations_{r.name}")
            for r in observed
        ]
        name = f"expectations-{uuid.uuid4().hex[:8]}"
        if df.isStreaming:
            # Observation objects are batch-only; streams use named
            # observe — per-micro-batch metrics surface via
            # StreamingQueryListener / query.lastProgress (ST6/ST7).
            df = df.observe(name, *metrics)
        else:
            obs = Observation(name)
            df = df.observe(obs, *metrics)
    quarantine = None
    if drop_rules:
        # built from the pre-observe frame: the observed metrics must
        # ride the main output exactly once (two branches carrying the
        # same Observation cannot meet in one plan)
        violated = F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.expr(r.constraint) | F.expr(r.constraint).isNull(),
                        F.lit(r.name),
                    )
                    for r in drop_rules
                ]
            )
        )
        quarantine = raw.withColumn("_violated_rules", violated).filter(
            F.size("_violated_rules") > 0
        )
    for r in drop_rules:
        df = df.filter(F.expr(r.constraint))
    return AppliedExpectations(df, obs, fail_rules, warn_rules, quarantine)


# ---------------------------------------------------------------------------
# Silver rule catalog (parity with silver_pipeline.py + data_quality.py,
# merchant_name mismatch fixed).
# ---------------------------------------------------------------------------

SILVER_RULES: dict[str, list[Rule]] = {
    "trip_events": [
        Rule(
            "sane_cdc_timestamp",
            "cdc_timestamp IS NULL OR cdc_timestamp > TIMESTAMP '1971-01-01 00:00:00'",
            "warn",
        ),
        Rule("valid_trip_id", "trip_id IS NOT NULL", "drop"),
        Rule(
            "valid_event_type",
            "event_type IN ('order_placed','order_accepted','courier_dispatched',"
            "'pickup_arrived','pickup_completed','dropoff_arrived','delivered',"
            "'cancelled')",
            "warn",
        ),
        Rule("valid_event_time", "event_time IS NOT NULL", "warn"),
    ],
    "eater": [
        Rule(
            "sane_cdc_timestamp",
            "cdc_timestamp IS NULL OR cdc_timestamp > TIMESTAMP '1971-01-01 00:00:00'",
            "warn",
        ),
        Rule("valid_eater_id", "eater_id IS NOT NULL", "drop"),
        Rule("valid_email", "email IS NOT NULL AND email LIKE '%@%'", "drop"),
        Rule(
            "email_format",
            r"email RLIKE '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$'",
            "warn",
        ),
    ],
    "merchant": [
        Rule(
            "sane_cdc_timestamp",
            "cdc_timestamp IS NULL OR cdc_timestamp > TIMESTAMP '1971-01-01 00:00:00'",
            "warn",
        ),
        Rule("valid_merchant_id", "merchant_id IS NOT NULL", "drop"),
        Rule("valid_name", "name IS NOT NULL", "warn"),
        Rule("valid_email", "email IS NOT NULL AND email LIKE '%@%'", "warn"),
    ],
    "courier": [
        Rule(
            "sane_cdc_timestamp",
            "cdc_timestamp IS NULL OR cdc_timestamp > TIMESTAMP '1971-01-01 00:00:00'",
            "warn",
        ),
        Rule("valid_courier_id", "courier_id IS NOT NULL", "drop"),
        Rule(
            "valid_vehicle",
            "vehicle_type IN ('bicycle','bike','scooter','motorcycle','car','walking')",
            "warn",
        ),
    ],
}
