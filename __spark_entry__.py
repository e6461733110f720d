"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship conditional-max lifecycle pivot (the
reference warehouse's load-bearing operator, SURVEY.md §2.4 A4) on
sf0.001. ``queries``/``oracle_sql`` expose the full operator battery
from ubeardw_databricks_lakehouse_spark.plans.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ubeardw_databricks_lakehouse_spark.plans import registry  # noqa: E402
from ubeardw_databricks_lakehouse_spark.plans.events_q import (  # noqa: E402
    q_user_lifecycle_pivot,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ubeardw_databricks_lakehouse_spark.core.session import ship_package

    ship_package(spark)
    return q_user_lifecycle_pivot(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
