#!/usr/bin/env python
"""Peel-ladder scale stress for k-core (operators/graph.kcore).

Graph per rung: N nodes with ~1.5 hash-derived random edges emitted
per node (ER-ish, average degree ~3 — just BELOW the ~3.35 emergence
threshold of the giant 3-core, so the periphery unravels completely
through a long near-critical cascade instead of one round) plus a
planted 1000-clique (degrees ~999) that must survive any realistic k.
Checks: every clique node survives with degree >= 999, the surviving
core is a small fraction of N (the periphery peeled), the executed
plan contains no CartesianProduct/BroadcastNestedLoopJoin, and the
wall exponent across rungs stays near-linear (each round is a degree
groupBy + two semi-joins over a shrinking edge set — all keyed).

GC discipline: each rung's frames are unpersisted before the next
(the PPS-ladder lesson, SCALING.md r10).

Usage: python tools/stress_kcore.py [--scales 2000000,8000000,32000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIQUE = 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="2000000,8000000,32000000")
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    # size the single JVM for the top rung (a 32M-node rung holds a
    # ~96M-row symmetrized set through shuffle + one checkpointed copy;
    # the default 8g heap OOMs even with per-round release — a real
    # deployment sizes executors for its shard, same thing). Explicit
    # env still wins.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        release_local_checkpoint,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.graph import kcore

    spark = get_spark(app_name="stress-kcore")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    clique = spark.createDataFrame(
        [(i, j) for i in range(CLIQUE) for j in range(i + 1, CLIQUE)],
        "src bigint, dst bigint",
    ).localCheckpoint(eager=True)

    results = []
    for n in scales:
        # 1.5 edges per node to hash-derived endpoints: avg degree ~3,
        # just under the giant-3-core threshold (near-critical peel)
        rnd = (
            spark.range(n)
            .select(
                F.col("id").alias("src"),
                F.explode(
                    F.when(
                        F.col("id") % 2 == 0,
                        F.array(
                            F.pmod(F.xxhash64("id", F.lit("e1")), F.lit(n)),
                            F.pmod(F.xxhash64("id", F.lit("e2")), F.lit(n)),
                        ),
                    ).otherwise(
                        F.array(F.pmod(F.xxhash64("id", F.lit("e1")), F.lit(n)))
                    )
                ).alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
        )
        edges = rnd.unionByName(clique).localCheckpoint(eager=True)

        # kcore is eager (the peel loop checkpoints and counts as it
        # runs), so the clock wraps the CALL, not just the final agg
        t0 = time.perf_counter()
        core = kcore(edges, k=args.k, n_iter=50).localCheckpoint(eager=True)
        n_core = core.count()
        wall = time.perf_counter() - t0
        plan = core._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

        clique_ok = core.where(
            (F.col("node") < CLIQUE) & (F.col("core_degree") >= CLIQUE - 1)
        ).count()
        assert clique_ok == CLIQUE, f"planted clique degraded: {clique_ok}"
        assert n_core < 0.05 * n + 10 * CLIQUE, (
            f"periphery did not peel: {n_core}/{n}"
        )

        results.append({
            "n": n, "k": args.k, "wall_s": round(wall, 2),
            "core_nodes": n_core, "core_frac": round(n_core / n, 4),
        })
        print(json.dumps(results[-1]), flush=True)
        release_local_checkpoint(core, allow_projection=True)
        release_local_checkpoint(edges, allow_projection=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        exponent = math.log(b["wall_s"] / a["wall_s"]) / math.log(b["n"] / a["n"])
        print(json.dumps({
            "metric": "kcore_peel_wall_exponent",
            "value": round(exponent, 2),
            "scales": [r["n"] for r in results],
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
