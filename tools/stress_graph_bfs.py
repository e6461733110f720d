#!/usr/bin/env python
"""Scaling ladder for operators/graph.bfs_hops on random graphs.

Generates a uniform random graph of E edges over V = E/10 nodes
(avg degree 20 undirected — dense enough that 3 hops from one seed
reach most of the component, the worst case for frontier size), runs
bounded 3-hop BFS from the default min-node seed, and records wall
plus the per-hop frontier sizes. Edge generation is xxhash64-salted
spark.range — fully distributed, no driver materialization. Prints
one JSON line per scale. Usage:

  python tools/stress_graph_bfs.py [--edges 1000000,2000000,4000000]
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
    ap.add_argument("--edges", default="1000000,2000000,4000000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark
    from ubeardw_databricks_lakehouse_spark.operators.graph import bfs_hops

    spark = get_spark(app_name="stress-bfs")
    spark.sparkContext.setLogLevel("ERROR")

    for e in [int(s) for s in args.edges.split(",")]:
        v = max(e // 10, 10)
        edges = spark.range(e).select(
            F.pmod(F.xxhash64(F.col("id"), F.lit("src")), F.lit(v)).alias(
                "src"
            ),
            F.pmod(F.xxhash64(F.col("id"), F.lit("dst")), F.lit(v)).alias(
                "dst"
            ),
        ).where(F.col("src") != F.col("dst"))
        t0 = time.time()
        dists = bfs_hops(edges, max_hops=3)
        per_hop = {
            int(r["dist"]): int(r["n"])
            for r in dists.groupBy("dist").agg(F.count("*").alias("n")).collect()
        }
        wall = time.time() - t0
        print(
            json.dumps(
                {
                    "edges": e,
                    "nodes": v,
                    "wall_s": round(wall, 2),
                    "frontier_by_hop": per_hop,
                    "reached": sum(per_hop.values()),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
