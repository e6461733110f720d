"""Shared helpers for the oracle-checked query battery.

Cross-engine determinism policy (Spark vs DuckDB value-hash):
- Sums/averages over DOUBLE columns are order-sensitive in the last
  bits; both engines shuffle differently. Every such aggregate routes
  through an exact DECIMAL sum, then one cast to DOUBLE — identical
  rationals convert to identical doubles in both engines.
- Top-k uses row_number() with a total ordering (unique key tiebreak),
  never bare LIMIT.
- Money: DECIMAL(12,2); rates: DECIMAL(4,2) — small enough that decimal
  products stay exact in both engines' precision rules (SURVEY.md §1.2
  decimal discipline).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, alias: str, prec: str = "decimal(12,2)") -> Column:
    """Exact-decimal sum surfaced as double (cross-engine stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(prec)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, prec: str = "decimal(12,2)") -> Column:
    """sum(decimal)/count(col) as double division (cross-engine stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(prec)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(col: str, alias: str, prec: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({col} AS {prec})) AS DOUBLE) AS {alias}"


def sql_davg(col: str, alias: str, prec: str = "DECIMAL(12,2)") -> str:
    return f"CAST(SUM(CAST({col} AS {prec})) AS DOUBLE) / COUNT({col}) AS {alias}"


def ensure_read_confs(spark) -> None:
    """Make reads work on ANY SparkSession, not just ours.

    The driver's correctness harness builds its own SparkSession (without
    core.session's configs), and events.parquet stores TIMESTAMP(NANOS)
    which Spark's parquet reader rejects unless
    spark.sql.legacy.parquet.nanosAsLong=true. The conf is runtime-settable,
    so every query self-protects here instead of relying on session setup.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NTZ→LTZ normalization below is only cross-engine-stable when
        # the session renders instants in UTC (DuckDB is tz-naive)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down (never observed) — reads may still work


def t(spark, sf_dir: str, name: str):
    ensure_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_event_ts(df)
    return df


def event_ts_expr(schema) -> Column:
    """Column expression normalizing the on-disk events ``ts`` to plain
    TIMESTAMP, for call sites that work from an explicit schema (the
    file-stream source) rather than a batch DataFrame. Same cases as
    normalize_event_ts."""
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = schema["ts"].dataType
    if isinstance(dt, LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    if isinstance(dt, TimestampNTZType):
        return F.col("ts").cast("timestamp")
    return F.col("ts")


def normalize_event_ts(df):
    """Normalize events.ts to plain TIMESTAMP regardless of how the
    driver generated the parquet:

    - TIMESTAMP(NANOS) + spark.sql.legacy.parquet.nanosAsLong=true →
      LongType nanoseconds; truncate to micros (integer division —
      double division would lose precision above 2^53 ns), exactly what
      DuckDB's micro-resolution timestamp does on read.
    - timestamp[us] without isAdjustedToUTC → TIMESTAMP_NTZ, which
      Spark 4 functions like unix_micros reject; reinterpret as UTC
      (session tz is pinned to UTC in ensure_read_confs, so the cast
      is value-preserving and matches DuckDB's naive reading)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
