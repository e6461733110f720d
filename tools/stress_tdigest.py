#!/usr/bin/env python
"""Scale stress for the mergeable t-digest quantile sketch
(operators/tdigest).

Generates N skewed doubles (lognormal-ish via hash-to-uniform, so the
input is deterministic and shuffle-free to produce), builds the digest
at two scales for the wall exponent, and checks three invariants at
the smaller scale:

- the summary stays BOUNDED: centroid count <= 2*delta regardless of N;
- total is exact;
- quantile rank error <= 1.5/delta, measured EXACTLY: the true rank of
  each estimate is one COUNT(v <= est) pass over the data (columnar
  scans make this cheap even at stress scale).

The point: the build is ONE map pass (partials) + ONE kilobyte
shuffle, so wall should scale ~linearly in N and the summary size not
at all.

Usage: python tools/stress_tdigest.py [--scales 2000000,8000000]
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
    ap.add_argument("--delta", type=float, default=200.0)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.tdigest import (
        tdigest_build,
        tdigest_quantiles,
    )

    spark = get_spark(app_name="stress-tdigest")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def gen(n: int):
        # deterministic skewed positive values: exp of a uniform from
        # the repo's hash-to-uniform idiom (heavy right tail)
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(1_000_000))
            / 1_000_000.0
        )
        return spark.range(n, numPartitions=32).select(
            F.exp(u * 6.0).alias("v"), (F.col("id") % 16).alias("g")
        )

    # warm-up: absorb WholeStageCodegen/JIT + Arrow worker spin-up so
    # the ladder measures steady state (the bench.py convention)
    tdigest_build(gen(100_000), "v", delta=args.delta).collect()

    results = []
    for n in scales:
        df = gen(n)
        t0 = time.time()
        dig = tdigest_build(df, "v", delta=args.delta)
        row = dig.collect()[0]
        wall = time.time() - t0
        results.append(
            {
                "n": n,
                "wall_sec": round(wall, 2),
                "centroids": len(row["means"]),
                "total": row["total"],
            }
        )
        assert row["total"] == float(n)
        assert len(row["means"]) <= 2 * args.delta

    # accuracy probe at the smaller scale: exact rank of each estimate
    # via one COUNT pass per quantile (cheap: scans are columnar)
    n0 = scales[0]
    df0 = gen(n0)
    dig0 = tdigest_build(df0, "v", delta=args.delta)
    qs = [0.01, 0.5, 0.99]
    est = {
        r["q"]: r["value"] for r in tdigest_quantiles(dig0, qs).collect()
    }
    max_err = 0.0
    for q, v in est.items():
        rank = df0.where(F.col("v") <= v).count() / n0
        max_err = max(max_err, abs(rank - q))
    ok = max_err <= 1.5 / args.delta

    if len(results) >= 2:
        import math

        r0, r1 = results[0], results[-1]
        exp = math.log(r1["wall_sec"] / r0["wall_sec"]) / math.log(
            r1["n"] / r0["n"]
        )
    else:
        exp = None
    print(
        json.dumps(
            {
                "ladder": results,
                "wall_exponent": round(exp, 2) if exp is not None else None,
                "max_rank_err": round(max_err, 5),
                "rank_err_bound": 1.5 / args.delta,
                "accuracy_ok": ok,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
