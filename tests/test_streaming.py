"""Streaming-layer tests: file-CDC bronze->silver with watermarked dedup,
and the applyInPandasWithState sessionizer vs its batch twin."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.streaming.pipeline import run_entity_pipeline
from ubeardw_databricks_lakehouse_spark.streaming.stateful import (
    streaming_sessionize,
)
from ubeardw_databricks_lakehouse_spark.testing.fixtures import (
    EATERS,
    debezium_envelope,
)


def _write_cdc_file(path: str, entity: str, rows: list[dict], op: str = "c") -> None:
    with open(path, "w") as f:
        for i, r in enumerate(rows):
            rec = {
                "kafka_key": str(i),
                "raw_value": debezium_envelope(entity, r, op=op,
                                               ts_ms=r.get("updated_at", 0) or 0),
                "kafka_topic": f"ubear.public.{entity}",
                "kafka_partition": 0,
                "kafka_offset": i,
                "kafka_timestamp": None,
            }
            f.write(json.dumps(rec) + "\n")


def test_streaming_bronze_silver_with_dup_drop(spark, tmp_path):
    src = tmp_path / "cdc"
    out = tmp_path / "lake"
    src.mkdir()
    # duplicate every eater record (same pk, same cdc ts) — watermarked
    # dedup must keep exactly one
    _write_cdc_file(str(src / "batch1.jsonl"), "eater", EATERS + EATERS)
    run_entity_pipeline(spark, str(src), "eater", str(out))

    bronze = spark.read.parquet(os.path.join(str(out), "bronze_eater"))
    silver = spark.read.parquet(os.path.join(str(out), "silver_eater"))
    assert bronze.count() == 10  # append-only: both copies land
    assert silver.count() == 5  # deduped
    assert silver.filter("email = 'alice.dupont@email.com'").count() == 1

    # incremental micro-batch: a new file streams through on restart
    new = dict(EATERS[0])
    new["eater_id"] = 99
    new["eater_uuid"] = "eater-uuid-099"
    new["email"] = "new.person@email.com"
    _write_cdc_file(str(src / "batch2.jsonl"), "eater", [new])
    run_entity_pipeline(spark, str(src), "eater", str(out))
    assert spark.read.parquet(os.path.join(str(out), "silver_eater")).count() == 6


def test_streaming_sessionizer_matches_batch(spark, tmp_path):
    """Closed sessions from the stateful operator == batch sessionization
    (for sessions the watermark has passed)."""
    from ubeardw_databricks_lakehouse_spark.plans.common import t as load

    events = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "value"
    )
    src = tmp_path / "events_stream"
    events.coalesce(1).write.parquet(str(src))

    stream = (
        spark.readStream.schema(events.schema).parquet(str(src))
    )
    sink = "stream_sessions_test"
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(sink)

    # batch twin: sessions strictly before (max ts - watermark) are closed
    from ubeardw_databricks_lakehouse_spark.plans.events_q import q_sessionization

    batch = q_sessionization(spark, "/root/testdata/sf0.001")
    # compare session event counts per user for sessions that closed
    got_counts = {
        (r.user_id, str(r.session_start)): r.n_events for r in got.collect()
    }
    batch_rows = (
        load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    # every closed streaming session must exist in the batch result with
    # identical (user, start, count)
    batch_sessions = {}
    for r in batch.join(
        load(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts")),
        "user_id",
    ).collect():
        pass  # structure check only below

    batch_by_user_session = {}
    sess = batch.collect()
    ev = load(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "event_id", "ts"
    ).collect()
    ev_ts = {(r.user_id, r.event_id): r.ts for r in ev}
    for r in sess:
        start_ts = ev_ts[(r.user_id, r.first_event_id)]
        batch_by_user_session[(r.user_id, str(start_ts))] = r.n_events

    assert len(got_counts) > 0
    for key, n in got_counts.items():
        assert batch_by_user_session.get(key) == n, f"mismatch at {key}"
