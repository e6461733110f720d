#!/usr/bin/env python
"""Scale stress for the sweep-line concurrency path
(operators/timeseries.interval_concurrency +
operators/ranking.global_running_sum).

Generates N half-open work intervals with a skewed duration mix (90%
short sessions, 10% long-tailed) over a --days horizon (default 30;
widen it so distinct boundaries do NOT saturate and the exponent
measures the range shuffle itself), measures the
full curve build at two scales for the wall exponent, and verifies the
distributed running sum against Spark's single-partition window form
at the smaller scale (bit-exact — all-integer deltas). The point: the
curve cost must scale in the number of BOUNDARIES (2N), not in curve
height or horizon length, and the only driver-side data is the O(P)
per-partition totals.

Usage: python tools/stress_concurrency.py [--scales 2000000,8000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="2000000,8000000")
    ap.add_argument("--days", type=int, default=30)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark
    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        interval_concurrency,
    )

    spark = get_spark(app_name="stress-concurrency")
    spark.sparkContext.setLogLevel("ERROR")

    def gen(n: int):
        base = F.lit("2024-01-01 00:00:00").cast("timestamp")
        start_s = F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(args.days * 86400))
        dur_s = F.when(
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10)) < 9,
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1800)),
        ).otherwise(F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(86400)))
        return spark.range(n).select(
            F.timestamp_seconds(
                F.unix_timestamp(base) + start_s
            ).alias("start_ts"),
            F.timestamp_seconds(
                F.unix_timestamp(base) + start_s + dur_s
            ).alias("end_ts"),
        )

    # warmup: pay codegen/JIT before the ladder (the first scale
    # otherwise reads slower than the second and the exponent goes
    # negative)
    interval_concurrency(gen(100_000).localCheckpoint(eager=True)).count()
    spark.catalog.clearCache()

    walls = {}
    for n in scales:
        ivs = gen(n).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        curve = interval_concurrency(ivs)
        n_points = curve.count()
        peak = curve.agg(F.max("concurrent")).collect()[0][0]
        wall = time.perf_counter() - t0
        walls[n] = wall
        print(
            json.dumps(
                {
                    "intervals": n,
                    "curve_points": n_points,
                    "peak_concurrent": peak,
                    "wall_s": round(wall, 2),
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()

    # bit-exact agreement with the window form at the smaller scale
    from pyspark.sql.window import Window

    ivs = gen(scales[0]).localCheckpoint(eager=True)
    got = interval_concurrency(ivs)
    deltas = (
        ivs.select(
            F.explode(
                F.array(
                    F.struct(F.col("start_ts").alias("ts"), F.lit(1).alias("d")),
                    F.struct(
                        (F.col("end_ts") + F.expr("interval 1 second")).alias(
                            "ts"
                        ),
                        F.lit(-1).alias("d"),
                    ),
                )
            ).alias("e")
        )
        .select("e.ts", "e.d")
        .groupBy("ts")
        .agg(F.sum("d").alias("d"))
    )
    ref = deltas.select(
        "ts", F.sum("d").over(Window.orderBy("ts")).alias("concurrent")
    )
    n_diff = (
        got.join(ref, "ts")
        .where(got["concurrent"] != ref["concurrent"])
        .count()
    )
    assert n_diff == 0 and got.count() == ref.count(), n_diff
    print(json.dumps({"window_form_agreement": "exact", "points": got.count()}))

    if len(scales) == 2:
        import math

        n1, n2 = scales
        e = math.log(walls[n2] / walls[n1]) / math.log(n2 / n1)
        print(json.dumps({"wall_exponent": round(e, 2)}))


if __name__ == "__main__":
    main()
