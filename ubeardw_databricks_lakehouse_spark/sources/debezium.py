"""Debezium CDC envelope parsing — the Bronze ingestion core.

Re-expresses the reference's Kafka->Bronze path (reference:
pipelines/bronze_pipeline.py:109-195, utils/transformations.py:178-194)
as composable DataFrame transforms. Input is any DataFrame (batch or
streaming) with the Kafka wire columns; test harnesses feed the same
envelope schema from files or in-memory rows, so the parse logic is
identical across live Kafka and tests.

All parsing is from_json with declared schemas (core/schemas.py) —
JVM-side, codegen'd, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.schemas import AFTER_SCHEMAS, DEBEZIUM_ENVELOPE_SCHEMA
from ..functions.cleaning import epoch_ms_to_ts


def kafka_stream(spark, topic: str, bootstrap_servers: str, **options) -> DataFrame:
    """Streaming Kafka source (bronze_pipeline.py:109-131).

    Requires the spark-sql-kafka package on the classpath; tests use
    file/memory sources feeding the same envelope schema instead.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def project_kafka_record(df: DataFrame) -> DataFrame:
    """CAST key/value to string + carry Kafka metadata (bronze:148-154)."""
    return df.selectExpr(
        "CAST(key AS STRING) AS kafka_key",
        "CAST(value AS STRING) AS raw_value",
        "topic AS kafka_topic",
        "partition AS kafka_partition",
        "offset AS kafka_offset",
        "timestamp AS kafka_timestamp",
    )


def parse_debezium_envelope(df: DataFrame, entity: str) -> DataFrame:
    """raw_value JSON -> typed entity columns + CDC metadata.

    Two-stage from_json (envelope, then per-entity ``after`` image) —
    parity with bronze_pipeline.py:155-195. Produces the Bronze schema:
    after-image columns + cdc_operation/cdc_timestamp/cdc_snapshot +
    whatever kafka_* columns the input carried.
    """
    after_schema = AFTER_SCHEMAS[entity]
    env = df.withColumn(
        "_env", F.from_json(F.col("raw_value"), DEBEZIUM_ENVELOPE_SCHEMA)
    )
    parsed = env.withColumn(
        "_after", F.from_json(F.col("_env.payload.after"), after_schema)
    )
    cols = [F.col(f"_after.{f.name}").alias(f.name) for f in after_schema.fields]
    meta = [
        F.col("_env.payload.op").alias("cdc_operation"),
        epoch_ms_to_ts(F.col("_env.payload.ts_ms")).alias("cdc_timestamp"),
        F.col("_env.payload.source.snapshot").alias("cdc_snapshot"),
    ]
    passthrough = [
        F.col(c)
        for c in df.columns
        if c.startswith("kafka_") and c != "kafka_key"
    ]
    return parsed.select(*cols, *meta, *passthrough)


def to_bronze(df: DataFrame, entity: str) -> DataFrame:
    """Full raw-Kafka-record -> Bronze transform for one entity.

    Bronze keeps epoch-ms longs raw (append-only fidelity); timestamp
    conversion happens in Silver, matching the medallion contract.
    """
    return parse_debezium_envelope(df, entity)
