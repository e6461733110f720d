"""ST7 event-history + quarantine tests: durable per-batch metrics in
_pipeline_events, and expectation-dropped rows routed to quarantine
(parity: reference DLT event log + data_quality quarantine routing)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.expectations.events import (
    PipelineEventLog,
)
from ubeardw_databricks_lakehouse_spark.expectations.rules import (
    Rule,
    apply_expectations,
)
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
from ubeardw_databricks_lakehouse_spark.streaming.pipeline import (
    run_entity_pipeline,
)
from ubeardw_databricks_lakehouse_spark.testing.fixtures import (
    EATERS,
    debezium_envelope,
)


def _write_cdc_file(path: str, entity: str, rows: list[dict]) -> None:
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            rec = {
                "kafka_key": str(i),
                "raw_value": debezium_envelope(
                    entity, r, op="c", ts_ms=r.get("updated_at", 0) or 0
                ),
                "kafka_topic": f"ubear.public.{entity}",
                "kafka_partition": 0,
                "kafka_offset": i,
                "kafka_timestamp": None,
            }
            f.write(json.dumps(rec) + "\n")


def test_batch_quarantine_captures_dropped_rows(spark):
    df = spark.createDataFrame(
        [(1, "a@x.com"), (None, "b@x.com"), (3, "nomail")],
        "id int, email string",
    )
    rules = [
        Rule("valid_id", "id IS NOT NULL", "drop"),
        Rule("valid_email", "email LIKE '%@%'", "drop"),
    ]
    applied = apply_expectations(df, rules)
    kept = applied.df.collect()
    quarantined = {
        r["email"]: list(r["_violated_rules"])
        for r in applied.quarantine.collect()
    }
    assert [r["id"] for r in kept] == [1]
    assert quarantined == {"b@x.com": ["valid_id"], "nomail": ["valid_email"]}


def test_event_log_record_roundtrip(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    log = PipelineEventLog(lake)
    log.record("gold", "dim_eater", {"violations_email": 2, "rows": 10}, 7)
    log.record("gold", "dim_eater", {}, 8)  # empty metrics: no rows
    rows = {(r["metric"], r["value"], r["batch_id"]) for r in log.read().collect()}
    assert rows == {("violations_email", 2, 7), ("rows", 10, 7)}
    assert log.read().schema["event_ts"].dataType.typeName().startswith("timestamp")


def test_streaming_pipeline_event_log_and_quarantine(spark, tmp_path):
    src = tmp_path / "cdc"
    out = tmp_path / "out"
    src.mkdir()
    bad_id = dict(EATERS[0])
    bad_id["eater_id"] = None
    bad_id["eater_uuid"] = "eater-uuid-bad"
    bad_email = dict(EATERS[1])
    bad_email["eater_id"] = 77
    bad_email["eater_uuid"] = "eater-uuid-nomail"
    bad_email["email"] = "not-an-email"
    _write_cdc_file(str(src / "b1.jsonl"), "eater", EATERS + [bad_id, bad_email])

    lake = Lakehouse(spark, str(out / "lake"))
    log = PipelineEventLog(lake)
    run_entity_pipeline(
        spark, str(src), "eater", str(out), event_log=log, quarantine=True
    )

    silver = spark.read.parquet(os.path.join(str(out), "silver_eater"))
    assert silver.count() == len(EATERS)  # both bad rows dropped

    quar = spark.read.parquet(os.path.join(str(out), "quarantine_eater"))
    by_uuid = {r["eater_uuid"]: r["_violated_rules"] for r in quar.collect()}
    assert "valid_eater_id" in by_uuid["eater-uuid-bad"]
    assert "valid_email" in by_uuid["eater-uuid-nomail"]

    events = log.read()
    stages = {r["entity"] for r in events.select("entity").distinct().collect()}
    assert {"bronze", "silver"} <= stages
    # numInputRows persisted for every stage; silver carries the
    # observe-based expectation counters too
    assert events.filter(
        (F.col("entity") == "silver") & (F.col("metric") == "numInputRows")
    ).count() >= 1
    named = {
        r["metric"]
        for r in events.filter(F.col("entity") == "silver").collect()
    }
    assert any(m.startswith("violations_") for m in named)
