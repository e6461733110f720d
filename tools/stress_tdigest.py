#!/usr/bin/env python
"""Merge-reuse amortization ladder for the t-digest sketch
(operators/tdigest.py) — the evidence for its 100 TB selling point.

At each rung: N hash-derived values across S sources. The per-source
digest table is built once OFF the clock (the stored summary a
warehouse keeps); then we time (a) the global rollup FROM SUMMARIES
(tdigest_merge — touches S kilobyte rows) vs (b) the full rebuild
from the raw values (tdigest_build — rescans N rows). Rebuild wall
must grow with N; merge wall must stay flat at O(S), independent of
N. Accuracy guard: both paths' p50/p99 must agree within the digest's
pinned rank-error bound of the analytic quantiles of the value
distribution.

GC discipline (the PPS-ladder lesson, SCALING.md r10): each rung's
checkpointed digest frame is unpersisted before the next rung so
multi-rung runs don't hold dead Arrow/checkpoint blocks.

Usage: python tools/stress_tdigest.py [--scales 4000000,16000000,64000000]
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
    ap.add_argument("--scales", default="4000000,16000000,64000000")
    ap.add_argument("--sources", type=int, default=64)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        release_local_checkpoint,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.tdigest import (
        tdigest_build,
        tdigest_merge,
        tdigest_quantiles,
    )

    spark = get_spark(app_name="stress-tdigest")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    results = []
    for n in scales:
        # hash-to-uniform values in [0, 1): analytic quantile(q) = q
        vals = spark.range(n).select(
            F.pmod(F.col("id"), F.lit(args.sources)).alias("source"),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000_007))
             / F.lit(1_000_000_007.0)).alias("v"),
        ).localCheckpoint(eager=True)  # time the sketch, not the generator

        per_source = tdigest_build(
            vals, "v", ["source"], delta=100.0
        ).localCheckpoint(eager=True)  # the stored summary table (off-clock)

        t0 = time.perf_counter()
        noop(tdigest_quantiles(tdigest_merge(per_source, [], delta=100.0),
                               [0.5, 0.99]))
        merge_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        noop(tdigest_quantiles(tdigest_build(vals, "v", delta=100.0),
                               [0.5, 0.99]))
        rebuild_s = time.perf_counter() - t0

        got = {
            r["q"]: r["value"]
            for r in tdigest_quantiles(
                tdigest_merge(per_source, [], delta=100.0), [0.5, 0.99]
            ).collect()
        }
        # merge path: re-compressing 64 per-source digests compounds
        # rank error toward ~2/delta = 0.02 (the single-build bound is
        # 1.5/delta = 0.015); assert the compounded bound plus slack so
        # the ladder can't flake at the exact theoretical margin
        assert abs(got[0.5] - 0.5) < 0.03 and abs(got[0.99] - 0.99) < 0.03, got

        results.append({
            "n": n, "sources": args.sources,
            "merge_s": round(merge_s, 2), "rebuild_s": round(rebuild_s, 2),
            "speedup": round(rebuild_s / merge_s, 1),
            "p50": round(got[0.5], 4), "p99": round(got[0.99], 4),
        })
        print(json.dumps(results[-1]), flush=True)
        release_local_checkpoint(per_source, allow_projection=True)
        release_local_checkpoint(vals, allow_projection=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(json.dumps({
            "metric": "tdigest_merge_amortization",
            "rebuild_growth": round(b["rebuild_s"] / a["rebuild_s"], 2),
            "merge_growth": round(b["merge_s"] / a["merge_s"], 2),
            "scales": [r["n"] for r in results],
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
