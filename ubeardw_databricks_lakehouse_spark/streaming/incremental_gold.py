"""Incremental gold — streaming silver feeding trip_fact via foreachBatch.

The reference rebuilds gold daily from full silver (batch_job cron).
This extension closes the latency gap: each micro-batch of new
trip_events triggers a *recompute of only the touched trips* —

    micro-batch -> distinct trip_ids -> join back to full silver ->
    conditional-max pivot over those trips -> guarded MERGE

Recomputing the touched groups (not folding partial batches) is what
keeps the pivot's order-insensitivity intact: a trip whose events span
micro-batches always re-aggregates from its complete event set, so the
result equals the daily-batch answer at every point. The MERGE's
``updated_at`` guard (reference gold_pipeline.py:794) keeps stale
replays harmless.

Scale: per batch, work is proportional to touched trips, and the
join back to silver prunes on trip_id (partition/file pruning on a
trip-bucketed silver at cluster scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..pipelines.gold import build_trip_fact
from ..storage.lakehouse import Lakehouse


def start_incremental_trip_fact(
    spark: SparkSession,
    trip_events_stream: DataFrame,
    silver_trip_events_path: str,
    eater_silver: DataFrame,
    merchant_silver: DataFrame,
    dim_location: DataFrame,
    lake: Lakehouse,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the foreachBatch query maintaining ``trip_fact``."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        touched = batch_df.select("trip_id").distinct()
        if touched.isEmpty():
            return
        full_events = spark.read.parquet(silver_trip_events_path)
        scoped = full_events.join(F.broadcast(touched), "trip_id", "inner")
        fact = build_trip_fact(scoped, eater_silver, merchant_silver, dim_location)
        lake.upsert(
            "trip_fact",
            fact,
            keys=["trip_id"],
            update_condition="source.updated_at > target.updated_at",
            partition_by=["date_partition", "region_partition"],
        )

    writer = (
        trip_events_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
