#!/usr/bin/env python
"""Scale stress for synchronous LPA community detection
(operators/graph.community_lpa).

Planted ring-of-cliques: N nodes in cliques of 8 (28 intra-edges
each), consecutive cliques bridged by one edge — ground truth known
by construction, generated map-only from spark.range (one keyed
self-join, no driver data). Measures wall per rung for the scaling
exponent and checks recovery: after 3 synchronous rounds every
clique's mode is its min id, so purity (fraction of nodes labeled
with their clique's min id) should be ~1.0 — bridges are degree-1
against 7 intra-neighbors and cannot flip a mode.

The point: each round is one edge equi-join + two keyed aggregations
with the label table checkpointed — wall should scale ~linearly in
|E| with a fixed small round count, the 100 TB contract.

Usage: python tools/stress_lpa.py [--scales 1000000,4000000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLIQUE = 8


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1000000,4000000")
    ap.add_argument("--n-iter", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.operators.graph import community_lpa

    spark = get_spark(app_name="stress-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    results = []
    for n in scales:
        n -= n % CLIQUE  # whole cliques only
        ids = spark.range(n).select(
            F.col("id"),
            (F.col("id") / CLIQUE).cast("bigint").alias("g"),
            F.pmod(F.col("id"), F.lit(CLIQUE)).alias("r"),
        )
        a, b = ids.alias("a"), ids.alias("b")
        intra = a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.r") < F.col("b.r"))
        ).select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        bridges = ids.where(
            (F.col("r") == CLIQUE - 1) & (F.col("id") + 1 < F.lit(n))
        ).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
        edges = intra.unionByName(bridges).localCheckpoint(eager=True)
        n_edges = edges.count()

        t0 = time.perf_counter()
        labels = community_lpa(edges, n_iter=args.n_iter)
        pure = labels.where(
            F.col("community") == (F.col("node") / CLIQUE).cast("bigint") * CLIQUE
        ).count()
        wall = time.perf_counter() - t0
        purity = pure / n
        results.append({"n_nodes": n, "n_edges": n_edges,
                        "wall_s": round(wall, 2), "purity": round(purity, 4)})
        print(json.dumps(results[-1]), flush=True)
        assert purity > 0.99, "planted cliques not recovered"

    if len(results) >= 2:
        a, b = results[0], results[-1]
        exponent = math.log(b["wall_s"] / a["wall_s"]) / math.log(
            b["n_edges"] / a["n_edges"]
        )
        print(json.dumps({
            "metric": "lpa_wall_exponent",
            "value": round(exponent, 2),
            "scales": [r["n_nodes"] for r in results],
            "n_iter": args.n_iter,
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
