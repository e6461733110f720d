"""Column-expression cleaning/normalization library.

Re-expresses the reference's utility transforms (reference:
utils/transformations.py:26-212, pipelines/silver_pipeline.py:195-313)
as pure Column expressions — everything stays inside WholeStageCodegen;
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex vocabularies (reference: silver_pipeline.py:200,206,253,262,310,313).
PHONE_JUNK = r"[^0-9+]"
POSTAL_JUNK = r"[^0-9A-Z]"
PLATE_JUNK = r"[^A-Z0-9-]"


def clean_string(col: Column | str) -> Column:
    """trim; empty string -> null (reference: transformations.py:70-76)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.when(c == "", F.lit(None)).otherwise(c)


def normalize_email(col: Column | str) -> Column:
    return F.lower(clean_string(col))


def normalize_name(col: Column | str) -> Column:
    """Trim + initcap person/business names (transformations.py:85-89)."""
    return F.initcap(clean_string(col))


def normalize_country(col: Column | str) -> Column:
    return F.upper(clean_string(col))


def normalize_phone(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return clean_string(F.regexp_replace(c, PHONE_JUNK, ""))


def normalize_postal_code(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return clean_string(F.regexp_replace(F.upper(c), POSTAL_JUNK, ""))


def normalize_license_plate(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return clean_string(F.regexp_replace(F.upper(c), PLATE_JUNK, ""))


def safe_cast_money(col: Column | str) -> Column:
    """Parse-to-DECIMAL(12,2) with malformed input -> null.

    The reference's safe_cast_numeric (transformations.py:197-212)
    swallows cast errors; under Spark 4 ANSI mode we use try_cast so the
    behavior is explicit rather than a silent ANSI exception.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("decimal(12,2)")


def epoch_ms_to_ts(col: Column | str) -> Column:
    """Epoch-milliseconds -> timestamp (bronze_pipeline.py:181-182)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def row_hash(*cols: str) -> Column:
    """SCD2 change-detection hash (reference: gold_pipeline.py:131-134).

    sha2-256 over '||'-joined, null-coalesced string casts. Column order
    is part of the contract — callers pass business attributes in a
    stable declared order.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return F.sha2(F.concat_ws("||", *parts), 256)


def valid_email_pred(col: str = "email") -> Column:
    """Silver expectation predicates (silver_pipeline.py:180-181)."""
    return F.col(col).isNotNull() & F.col(col).like("%@%")


def email_format_pred(col: str = "email") -> Column:
    return F.col(col).rlike(r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$")
