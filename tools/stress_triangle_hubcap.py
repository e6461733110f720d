#!/usr/bin/env python
"""Dense-core stress for the hub-capped triangle counter
(operators/graph.triangle_counts(hub_cap=...)).

The sf0.1 co-supply graph is the adversarial dense regime the r8
review flagged: ~213k thresholded edges over ~1,000 suppliers (43%
dense), where degree orientation's O(sqrt(E)) out-degree bound is no
help because sqrt(E) ~ half the vertex set — the uncapped wedge join
enumerates ~22M candidates and walls at ~8 s even at sf0.1; at 100x
that plan is E^1.5. The hub cap bounds wedges at |V|*C(cap,2) BY
CONSTRUCTION, making the capped run's cost independent of core
density.

For each cap this prints wall clock, the audit's wedge-drop
accounting (triangle_hub_audit — kept/dropped/total must reconcile),
triangle recall (capped total / exact total), and top-50 node overlap
vs the exact counts (the q_triangle_suppliers surface). The capped
counts are a deterministic lower bound; the point of the harness is
to chart the recall/wall curve so a caller can size the cap with the
drop share in hand, and to pin that the capped wall stays flat as the
cap shrinks.

Usage: python tools/stress_triangle_hubcap.py [--sf /root/testdata/sf0.1]
       [--caps 32,64,128]
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
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--caps", default="32,64,128")
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
        triangle_hub_audit,
    )
    from ubeardw_databricks_lakehouse_spark.plans.relational import (
        cosupply_edges,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    edges = cosupply_edges(spark, args.sf).localCheckpoint(eager=True)
    n_edges = edges.count()
    n_nodes = (
        edges.selectExpr("src AS n").union(edges.selectExpr("dst AS n"))
        .distinct()
        .count()
    )
    density = 2.0 * n_edges / (n_nodes * (n_nodes - 1))
    print(
        json.dumps(
            {
                "graph": "cosupply",
                "sf": args.sf,
                "edges": n_edges,
                "nodes": n_nodes,
                "density": round(density, 4),
            }
        ),
        flush=True,
    )

    t0 = time.monotonic()
    exact = {
        r["node"]: r["triangles"]
        for r in triangle_counts(edges).collect()
    }
    exact_wall = time.monotonic() - t0
    exact_total = sum(exact.values()) // 3
    top50_exact = {
        n for n, _ in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    }
    print(
        json.dumps(
            {
                "cap": None,
                "wall_s": round(exact_wall, 2),
                "triangles": exact_total,
            }
        ),
        flush=True,
    )

    for cap in caps:
        audit = triangle_hub_audit(edges, hub_cap=cap).collect()[0]
        assert (
            audit["wedges_kept"] + audit["wedges_dropped"]
            == audit["wedges_total"]
        ), "audit accounting does not reconcile"
        for mode in ("drop", "estimate"):
            t0 = time.monotonic()
            capped = {
                r["node"]: r["triangles"]
                for r in triangle_counts(
                    edges, hub_cap=cap, on_hub=mode
                ).collect()
            }
            wall = time.monotonic() - t0
            if mode == "drop":
                assert all(
                    capped[n] <= exact.get(n, 0) for n in capped
                ), "drop-mode counts exceeded exact — not a lower bound"
            top50_capped = {
                n
                for n, _ in sorted(
                    capped.items(), key=lambda kv: (-kv[1], kv[0])
                )[:50]
            }
            rel_err = sorted(
                abs(capped.get(n, 0) - exact[n]) / max(exact[n], 1)
                for n in exact
            )
            print(
                json.dumps(
                    {
                        "cap": cap,
                        "mode": mode,
                        "wall_s": round(wall, 2),
                        "triangles": sum(capped.values()) // 3,
                        "total_ratio_vs_exact": round(
                            (sum(capped.values()) / 3)
                            / max(exact_total, 1),
                            3,
                        ),
                        "top50_overlap": len(top50_exact & top50_capped)
                        / 50.0,
                        "median_node_rel_err": round(
                            rel_err[len(rel_err) // 2], 3
                        ),
                        "p95_node_rel_err": round(
                            rel_err[int(len(rel_err) * 0.95)], 3
                        ),
                        "capped_pivots": audit["capped_pivots"],
                        "total_pivots": audit["total_pivots"],
                        "wedges_kept": audit["wedges_kept"],
                        "drop_share": round(
                            audit["wedges_dropped"]
                            / max(audit["wedges_total"], 1),
                            3,
                        ),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
