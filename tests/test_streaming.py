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


def test_stream_stream_join_carries_watermarks_and_matches_batch(spark, tmp_path):
    """Inner stream-stream interval join: result equals the batch join;
    both sides carry event-time watermarks (what bounds join state)."""
    import os

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.plans.common import t
    from ubeardw_databricks_lakehouse_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    sf = "/root/testdata/sf0.001"
    ev = t(spark, sf, "events")

    def side(df, kind, ts_name, id_name):
        return df.filter(F.col("event_type") == kind).select(
            "user_id",
            F.col("event_id").alias(id_name),
            F.col("ts").alias(ts_name),
        )

    batch = stream_stream_interval_join(
        side(ev, "view", "view_ts", "view_id"),
        side(ev, "click", "click_ts", "click_id"),
        key="user_id", left_ts="view_ts", right_ts="click_ts",
        horizon="1 hour",
    )
    n_batch = batch.count()

    src = os.path.join(sf, "events.parquet")
    schema = spark.read.parquet(src).schema
    stream_dir = tmp_path / "src"
    stream_dir.mkdir()
    os.symlink(src, stream_dir / "events.parquet")

    def stream_side(kind, ts_name, id_name):
        from ubeardw_databricks_lakehouse_spark.plans.common import event_ts_expr

        raw = spark.readStream.schema(schema).parquet(str(stream_dir))
        raw = raw.withColumn("ts", event_ts_expr(schema))
        return side(raw, kind, ts_name, id_name)

    joined = stream_stream_interval_join(
        stream_side("view", "view_ts", "view_id"),
        stream_side("click", "click_ts", "click_id"),
        key="user_id", left_ts="view_ts", right_ts="click_ts",
        horizon="1 hour", watermark="2 hours",
    )
    # both event-time columns carry the 2h watermark delay marker
    analyzed = joined._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("-T7200000ms") >= 2, analyzed.splitlines()[0]
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ss_join_test")
    assert got.count() == n_batch
    assert sorted(c for c in got.columns) == sorted(batch.columns)


def test_native_session_window_merges_and_splits(spark):
    """Batch session_window semantics: events within the gap merge into
    one session (including a bridge event joining two would-be
    sessions); events past the gap split. Window = [first, last+gap)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # user 1: 10:00, 10:20, 10:40 chain-merge into one session
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:20:00"),
            (1, "2024-01-01 10:40:00"),
            # user 1: 12:00 is > 30min after 10:40 -> new session
            (1, "2024-01-01 12:00:00"),
            # user 2: single event
            (2, "2024-01-01 09:00:00"),
        ],
        ["user_id", "ts_str"],
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"))
    rows = sorted(
        (
            r["user_id"],
            str(r["w"]["start"]),
            str(r["w"]["end"]),
            r["n"],
        )
        for r in df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert rows == [
        (1, "2024-01-01 10:00:00", "2024-01-01 11:10:00", 3),
        (1, "2024-01-01 12:00:00", "2024-01-01 12:30:00", 1),
        (2, "2024-01-01 09:00:00", "2024-01-01 09:30:00", 1),
    ]


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """Left-outer stream-stream join: an unmatched left row must emit
    null-padded once the right watermark passes its horizon. Driven as
    two availableNow runs over one checkpoint — run 2's late file
    advances the watermark persisted by run 1, which is exactly the
    restart-and-expire path a production job takes."""
    import os

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.streaming.joins import (
        stream_stream_interval_join,
    )

    views_dir = tmp_path / "views"
    clicks_dir = tmp_path / "clicks"
    views_dir.mkdir()
    clicks_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_one(d, name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))

    vschema = "user_id long, view_id long, view_ts timestamp"
    cschema = "user_id long, click_id long, click_ts timestamp"
    ts = lambda s: __import__("datetime").datetime.fromisoformat(s)  # noqa: E731
    # u1's view gets a click inside the 1h horizon; u2's never does
    write_one(views_dir, "a", [(1, 100, ts("2024-01-01 10:00:00")),
                               (2, 200, ts("2024-01-01 10:00:00"))], vschema)
    write_one(clicks_dir, "a", [(1, 900, ts("2024-01-01 10:30:00"))], cschema)

    out_dir = str(tmp_path / "out")

    def run_once():
        # file sink, not memory: only file sinks support resuming from
        # the checkpoint, which is the mechanism this test exercises
        v = spark.readStream.schema(vschema).parquet(str(views_dir))
        c = spark.readStream.schema(cschema).parquet(str(clicks_dir))
        j = stream_stream_interval_join(
            v, c, key="user_id", left_ts="view_ts", right_ts="click_ts",
            horizon="1 hour", watermark="10 minutes", how="left_outer",
        )
        q = (
            j.writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r["user_id"], r["view_id"], r["click_id"])
            for r in spark.read.parquet(out_dir).collect()
        }

    got1 = run_once()
    assert (1, 100, 900) in got1  # matched pair emits in run 1
    assert (2, 200, None) not in got1  # unmatched held in state

    # run 2: much later rows on BOTH inputs — the global watermark is
    # the MIN across every event-time column, so a stalled views side
    # would pin it and nothing would ever expire. The watermark COMMITS
    # at batch end and state eviction applies it in the NEXT batch
    # (Spark's documented one-batch delay for outer results) — run 3's
    # files trigger that next batch and flush the expired row.
    write_one(clicks_dir, "b", [(99, 901, ts("2024-01-01 20:00:00"))], cschema)
    write_one(views_dir, "b", [(99, 300, ts("2024-01-01 20:00:00"))], vschema)
    got2 = run_once()
    write_one(clicks_dir, "c", [(98, 902, ts("2024-01-01 20:30:00"))], cschema)
    write_one(views_dir, "c", [(98, 301, ts("2024-01-01 20:30:00"))], vschema)
    got3 = run_once()
    assert (2, 200, None) in got3  # null-padded row flushed on expiry
    # matched pair never duplicates across restarts
    assert sum(1 for r in got3 if r == (1, 100, 900)) == 1
