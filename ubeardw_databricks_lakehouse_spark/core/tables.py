"""Loaders for the driver-provided parquet testdata (TESTDATA.md).

Kept trivially thin so Catalyst sees a plain parquet scan — predicate
pushdown, column pruning, and partition-size splitting all apply
untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    from ..plans.common import ensure_read_confs

    ensure_read_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all testdata tables as temp views for spark.sql use."""
    for name in TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            load_table(spark, name, sf_dir).createOrReplaceTempView(name)
