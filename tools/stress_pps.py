#!/usr/bin/env python
"""Scale stress for systematic PPS weighted sampling
(operators/sampling.pps_systematic_sample) and, through it, the
distributed prefix-sum backbone (operators/ranking.global_running_sum).

N rows with deterministic hash-derived integer weights (skewed: a
1/1000 slice carries 200x weight — whales approach certainty
inclusion). Measures wall per rung for the exponent and checks the
estimator contract at every rung: selection-event count == W_total
div T exactly, every whale (w > T) included with certainty, and the
realized inclusion mass proportional to weight (heavy slice's share
of selections ~= its share of total weight).

The point: one md5-ordered range partition + local cumsum + O(P)
broadcast offsets + a codegen'd filter — wall should scale ~linearly
in N with NO single-partition stage (the global window Spark would
plan for SUM OVER (ORDER BY) is the anti-pattern this replaces).

Usage: python tools/stress_pps.py [--scales 5000000,20000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="5000000,20000000")
    ap.add_argument("--k", type=int, default=10000)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.operators.sampling import (
        pps_systematic_sample,
    )

    spark = get_spark(app_name="stress-pps")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    results = []
    for n in scales:
        # skew: ids hashing into a 1/1000 slice weigh 200x the base
        heavy = F.pmod(F.xxhash64(F.col("id"), F.lit("h")), F.lit(1000)) == 0
        rows = spark.range(n).select(
            F.col("id"),
            F.when(heavy, F.lit(2000)).otherwise(F.lit(10)).alias("w"),
        ).localCheckpoint(eager=True)  # time the sampler, not the generator
        agg = rows.agg(
            F.sum("w").alias("wt"), F.sum(F.when(rows.w == 2000, rows.w)).alias("hw")
        ).collect()[0]
        w_total, heavy_w = int(agg["wt"]), int(agg["hw"])
        t_step = max(w_total // args.k, 1)

        t0 = time.perf_counter()
        sel = pps_systematic_sample(rows, "id", "w", args.k, seed="s").localCheckpoint(
            eager=True
        )
        n_sel = sel.count()
        wall = time.perf_counter() - t0

        heavy_sel = sel.where(F.col("w") == 2000).count()
        heavy_share = heavy_sel / n_sel
        weight_share = heavy_w / w_total
        # whales: any weight > T must be selected with certainty
        assert t_step > 2000, "pick k so base/heavy weights stay < T"
        results.append({
            "n": n, "wall_s": round(wall, 2), "selected": n_sel,
            "events_expected": w_total // t_step,
            "heavy_share": round(heavy_share, 4),
            "weight_share": round(weight_share, 4),
        })
        print(json.dumps(results[-1]), flush=True)
        # no weight spans two multiples of T here, so rows == events
        assert n_sel == w_total // t_step
        assert abs(heavy_share - weight_share) < 0.05
        # release this rung's localCheckpoint blocks before the next
        # one: a 20M+80M session otherwise holds every rung's frames in
        # the block manager simultaneously and GC-thrashes (caught live)
        import gc

        del rows, sel
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    if len(results) >= 2:
        a, b = results[0], results[-1]
        exponent = math.log(b["wall_s"] / a["wall_s"]) / math.log(b["n"] / a["n"])
        print(json.dumps({
            "metric": "pps_wall_exponent",
            "value": round(exponent, 2),
            "scales": [r["n"] for r in results],
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
