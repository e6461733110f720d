"""Static-dimension generator queries (F9/F10/F11 — dim_date/dim_time).

The gold generators (pipelines/gold.py) exposed as oracle-checked
queries: Spark builds them with sequence+explode; DuckDB's oracle uses
generate_series. Cardinalities are the reference's own: 4,018 days,
1,440 minutes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..pipelines.gold import generate_dim_date, generate_dim_time


def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = generate_dim_date(spark)
    # day_name/month_name are locale-formatted — compared via the SQL
    # oracle too (DuckDB dayname/monthname are English like Spark's
    # root-locale EEEE/MMMM).
    return d.select(
        "full_date",
        "date_key",
        "day_of_week",
        "day_name",
        "is_weekend",
        "week_of_year",
        "month_number",
        "month_name",
        "quarter",
        "year",
    )


Q_DIM_DATE_SQL = """
SELECT CAST(d AS DATE) AS full_date,
  CAST(STRFTIME(d, '%Y%m%d') AS INTEGER) AS date_key,
  DAYOFWEEK(d) + 1 AS day_of_week,
  DAYNAME(d) AS day_name,
  DAYOFWEEK(d) IN (0, 6) AS is_weekend,
  WEEKOFYEAR(d) AS week_of_year,
  MONTH(d) AS month_number,
  MONTHNAME(d) AS month_name,
  QUARTER(d) AS quarter,
  YEAR(d) AS year
FROM (SELECT UNNEST(GENERATE_SERIES(DATE '2020-01-01', DATE '2030-12-31', INTERVAL 1 DAY)) AS d)
"""


def q_dim_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return generate_dim_time(spark)


Q_DIM_TIME_SQL = """
SELECT hour_24 * 100 + minute_val AS time_key,
  LPAD(CAST(hour_24 AS VARCHAR), 2, '0') || ':' || LPAD(CAST(minute_val AS VARCHAR), 2, '0') AS time_value,
  hour_24,
  CASE WHEN hour_24 = 0 THEN 12 WHEN hour_24 > 12 THEN hour_24 - 12 ELSE hour_24 END AS hour_12,
  CASE WHEN hour_24 < 12 THEN 'AM' ELSE 'PM' END AS am_pm,
  minute_val AS minute,
  CASE WHEN hour_24 BETWEEN 0 AND 5 THEN 'Night'
       WHEN hour_24 BETWEEN 6 AND 11 THEN 'Morning'
       WHEN hour_24 BETWEEN 12 AND 17 THEN 'Afternoon'
       WHEN hour_24 BETWEEN 18 AND 21 THEN 'Evening'
       ELSE 'Late Night' END AS time_period,
  (hour_24 BETWEEN 11 AND 14) OR (hour_24 BETWEEN 18 AND 21) AS is_peak_hour
FROM (
  SELECT CAST(m // 60 AS INTEGER) AS hour_24, CAST(m % 60 AS INTEGER) AS minute_val
  FROM (SELECT UNNEST(GENERATE_SERIES(0, 1439)) AS m)
)
"""
