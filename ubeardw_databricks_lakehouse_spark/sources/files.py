"""Schema-enforced file sources beyond parquet: CSV and JSON-lines,
with corrupt-record quarantine.

Reference parity: the reference's ingestion edge accepts serialized
text records (Kafka JSON envelopes, `sources/debezium.py`); batch
re-ingestion of the same data from files is the standard backfill
path, and a warehouse that claims "every query a reference user runs"
needs the file-format edge too (cf. Spark's DataFrameReader
csv/json options and Databricks' badRecordsPath).

Design rules:
- ALWAYS an explicit schema. Schema inference reads the data twice and
  silently drifts between files at scale; the readers here take a
  StructType and run in PERMISSIVE mode with a `_corrupt_record`
  column, so malformed rows become data (quarantinable, countable,
  re-parseable) instead of job failures — the expectations layer's
  quarantine contract (`expectations/rules.py`) applied at the source.
- Reads are streaming-friendly: one pass, no driver-side collection;
  a malformed row costs a null row + the raw text, never a task retry.
- Writers exist for round-trip testing and export symmetry (the
  training-export tier writes parquet; CSV/JSON sinks cover the
  interchange case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
    multi_line: bool = False,
) -> DataFrame:
    """PERMISSIVE CSV read: rows that do not parse into ``schema`` land
    with all data columns null and the raw line in ``_corrupt_record``.

    ``multi_line=True`` supports quoted fields with embedded newlines —
    but makes files NON-SPLITTABLE (one task per file), so leave it off
    unless the data needs it and keep per-file sizes bounded when on."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """PERMISSIVE JSON-lines read with corrupt-record capture."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, quarantine, parsed): clean rows drop the corrupt column;
    quarantine keeps the raw text for replay/inspection; ``parsed`` is
    the CACHED parse both are built on — call ``parsed.unpersist()``
    when done with both sides, or the cached corpus leaks across calls.

    Spark refuses plans whose only referenced column from a raw
    CSV/JSON scan is ``_corrupt_record`` (UNSUPPORTED_FEATURE.
    QUERY_ONLY_CORRUPT_RECORD_COLUMN) — so the parse is materialized
    here via cache(), the engine's documented contract for this
    pattern; callers that re-read at scale should persist the parsed
    frame to a table instead."""
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, quarantine, df


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", header)
        # quote/escape so embedded separators, quotes, and newlines
        # survive the round trip
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink — the other JVM-native columnar interchange format
    (Hive-ecosystem handoff); schema travels in the file."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC read with an enforced schema (projection/pruning work as
    with parquet; no corrupt-record concept — ORC is self-describing
    binary, a torn file fails the task rather than a row)."""
    return spark.read.schema(schema).orc(path)
