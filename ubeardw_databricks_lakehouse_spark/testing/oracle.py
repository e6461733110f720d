"""Local DuckDB-oracle differential harness (mirrors the driver's t2).

Runs each registry query on Spark and its oracle SQL on DuckDB against
the same parquet tables, then compares row count + column names +
order-insensitive value multiset.

Comparison normalization: column order is sorted by name; rows are
sorted by their full string rendering; floats are rendered with repr
(exact bits — our cross-engine determinism policy is supposed to make
them identical, so we compare strictly and surface any drift).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

from ..core.schemas import TESTDATA_TABLES


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _normalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def _spark_kind(dt) -> str:
    """Coarse type kind for cross-engine dtype parity.

    The driver's value-hash is type-sensitive at the pandas-dtype level:
    int32 vs int64 hash alike (both numeric), but DuckDB HUGEINT lands as
    object dtype and hash-mismatches equal values (round-1 q_lang_quality).
    We compare coarse kinds so that class of artifact is caught locally.
    """
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return "list<" + _spark_kind(dt.elementType) + ">"
    return "other"


_DUCK_KINDS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint",  # pandas object dtype — the driver WILL mismatch
    "FLOAT": "float", "DOUBLE": "float",
    "BOOLEAN": "bool", "VARCHAR": "str", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
}


def _duck_kind(t) -> str:
    s = str(t)
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]"):
        return "list<" + _duck_kind(s[:-2]) + ">"
    return _DUCK_KINDS.get(s, "other")


def _kind_diffs(sdf, drel) -> list[tuple[str, str, str]]:
    s_kinds = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
    d_kinds = dict(zip(drel.columns, [_duck_kind(t) for t in drel.types]))
    diffs = []
    for col in sorted(set(s_kinds) | set(d_kinds)):
        sk, dk = s_kinds.get(col, "<missing>"), d_kinds.get(col, "<missing>")
        if sk != dk:
            diffs.append((col, sk, dk))
    return diffs


# Final-output kinds the driver's pandas-level value-hash has treated
# identically across engines in five rounds of evidence. Everything
# else is DRIVER-UNSAFE even when the value multisets are bit-exact:
# r1 proved it for HUGEINT (q_lang_quality), r5 for DECIMAL finals
# (q_bm25_search, q_gapfill_daily, q_interpolate_daily,
# q_pagerank_trading, q_customer_percentiles — all rows+schema green,
# hash red, values locally exact). Matching kinds on both sides do NOT
# help: both engines emitted DECIMAL in r5 and the driver still
# mismatched (Spark's toPandas keeps object Decimals, DuckDB's .df()
# renders float64). Policy: exact DECIMAL internals, one final cast to
# DOUBLE (plans/common.py).
_DRIVER_SAFE_KINDS = frozenset(
    {"int", "float", "bool", "str", "date", "ts"}
)


def _unsafe_cols(sdf, drel) -> list[tuple[str, str, str]]:
    """Final columns whose kind (on either engine) is outside the
    driver-proven-safe set — predicts a driver hash_match=false even
    when the local value comparison is exact."""
    s_kinds = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
    d_kinds = dict(zip(drel.columns, [_duck_kind(t) for t in drel.types]))
    out = []
    for col in sorted(set(s_kinds) | set(d_kinds)):
        sk, dk = s_kinds.get(col, "<missing>"), d_kinds.get(col, "<missing>")
        if sk not in _DRIVER_SAFE_KINDS or dk not in _DRIVER_SAFE_KINDS:
            out.append((col, sk, dk))
    return out


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, fn, oracle: str, sf_dir: str
) -> dict:
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    d = con.sql(oracle)
    d_rows = [tuple(r) for r in d.fetchall()]
    d_cols = list(d.columns)

    sc, sr = _normalize(s_cols, s_rows)
    dc, dr = _normalize(d_cols, d_rows)
    kind_diffs = _kind_diffs(sdf, d)
    unsafe = _unsafe_cols(sdf, d)
    result = {
        "rows_spark": len(sr),
        "rows_duck": len(dr),
        "cols_match": sc == dc,
        "count_match": len(sr) == len(dr),
        "values_match": sr == dr,
        "dtype_match": not kind_diffs,
        "driver_safe": not unsafe,
    }
    if kind_diffs:
        result["dtype_diffs"] = kind_diffs
    if unsafe:
        result["unsafe_cols"] = unsafe
    if not result["cols_match"]:
        result["cols_spark"], result["cols_duck"] = sc, dc
    if result["count_match"] and result["cols_match"] and not result["values_match"]:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        result["first_diffs"] = diffs
    return result


def run_all(spark: SparkSession, sf_dir: str, only: list[str] | None = None) -> dict:
    from ..core.session import ship_package
    from ..plans.registry import QUERIES

    ship_package(spark)  # UDF-bearing plans need the package on workers
    con = duck_con(sf_dir)
    results = {}
    for q in QUERIES:
        if only and q.name not in only:
            continue
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            results[q.name] = {"rows_spark": df.count(), "rows_only": True}
            continue
        try:
            results[q.name] = compare_query(spark, con, q.fn, q.oracle, sf_dir)
        except Exception as e:  # surface, don't halt the sweep
            results[q.name] = {"error": f"{type(e).__name__}: {e}"}
    return results
