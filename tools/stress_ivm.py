#!/usr/bin/env python
"""Scale stress for incremental view maintenance
(storage/ivm.refresh_metric_view): the O(changes) claim, measured.

For each base size N: seed a CDF-tracked base table (N rows, 1000
groups), seed the aggregate view (full scan — recorded watermark),
then apply a FIXED 10k-row update batch and time (a) the incremental
refresh and (b) a full groupBy recompute of the same view. The
incremental wall should stay ~FLAT as N grows (it reads only the
change rows past the watermark); the full recompute grows with N —
the gap IS the 100 TB argument. Correctness at every rung: the
incrementally-maintained view equals the full recompute exactly
(DECIMAL increments, the q_ivm_refresh contract).

Usage: python tools/stress_ivm.py [--scales 1000000,4000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUPS = 1000
CHANGES = 10_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,4000000")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.storage.ivm import refresh_metric_view
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import (
        Lakehouse,
        upsert_with_cdf,
    )

    spark = get_spark(app_name="stress-ivm")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    results = []
    for n in scales:
        work = tempfile.mkdtemp(prefix="ivm_stress_")
        lake = Lakehouse(spark, work)
        rows = spark.range(n).select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(GROUPS)).alias("grp"),
            (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)) / 100)
            .cast("decimal(18,2)")
            .alias("val"),
        )
        upsert_with_cdf(lake, "base", rows, keys=["k"], batch_ts="2026-01-01 00:00:00")
        refresh_metric_view(lake, "view", "base", ["grp"], "val")  # seed

        # fixed-size update wave: first CHANGES keys get val += 1
        wave = spark.range(CHANGES).select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(GROUPS)).alias("grp"),
            (
                (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)) / 100)
                .cast("decimal(18,2)")
                + F.lit(1).cast("decimal(18,2)")
            ).cast("decimal(18,2)").alias("val"),
        )
        upsert_with_cdf(lake, "base", wave, keys=["k"], batch_ts="2026-01-02 00:00:00")

        t0 = time.perf_counter()
        refresh_metric_view(lake, "view", "base", ["grp"], "val")
        incr_wall = time.perf_counter() - t0

        t0 = time.perf_counter()
        full = (
            lake.read("base")
            .groupBy("grp")
            .agg(
                F.sum(F.col("val").cast("decimal(18,2)"))
                .cast("decimal(18,2)")
                .alias("sum_value"),
                F.count("*").alias("n_rows"),
            )
        )
        full_rows = {r["grp"]: (r["sum_value"], r["n_rows"]) for r in full.collect()}
        full_wall = time.perf_counter() - t0

        view_rows = {
            r["grp"]: (r["sum_value"], r["n_rows"])
            for r in lake.read("view").collect()
        }
        exact = view_rows == full_rows
        results.append({
            "n_base": n, "changes": CHANGES,
            "incremental_s": round(incr_wall, 2),
            "full_recompute_s": round(full_wall, 2),
            "view_equals_full": exact,
        })
        print(json.dumps(results[-1]), flush=True)
        assert exact
        shutil.rmtree(work, ignore_errors=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(json.dumps({
            "metric": "ivm_incremental_wall_exponent",
            "value": round(
                math.log(max(b["incremental_s"], 0.01) / max(a["incremental_s"], 0.01))
                / math.log(b["n_base"] / a["n_base"]),
                2,
            ),
            "full_recompute_exponent": round(
                math.log(b["full_recompute_s"] / a["full_recompute_s"])
                / math.log(b["n_base"] / a["n_base"]),
                2,
            ),
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
