#!/usr/bin/env python
"""Amortization ladder for incremental ANN maintenance
(similarity.ivf_upsert) — the ANN counterpart of
tools/stress_neardup_upsert.

Geometry: K tight axis-aligned clusters (unit spike on axis c = id % K
plus hash-derived noise), centroids GIVEN analytically (the stored
index state — building it is the one-shot cost this operator
amortizes away). Per rung:

- ``upsert_s``: assign a fixed-size delta to the existing centroids
  (``ivf_upsert`` — O(delta·K) broadcast work, the base corpus never
  read). Expect FLAT in base size.
- ``rebuild_s``: the alternative a one-shot index forces — re-assign
  the ENTIRE grown corpus (``assign_cells`` over base+delta). Expect
  linear in base.
- assignment accuracy vs the planted cluster axis (recall proxy; the
  noise is far below the inter-cluster separation, so expect ~1.0 on
  both paths).

A delta ladder at the largest base pins upsert cost linear in delta.
Every rung records loadavg (tools/_loadgate). The drift guard is
pytest-pinned (test_retrieval_export.py::test_ivf_upsert_drift_guard);
this tool is the wall-clock story.

Usage: python tools/stress_ivf_upsert.py --bases 1000000,4000000,16000000 --delta 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _loadgate import load_stamp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bases", default="1000000,4000000,16000000")
    ap.add_argument("--delta", type=int, default=100000)
    ap.add_argument("--deltas", default="100000,400000",
                    help="delta ladder at the LARGEST base")
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--cells", type=int, default=8)
    args = ap.parse_args()
    bases = [int(x) for x in args.bases.split(",")]
    deltas = [int(x) for x in args.deltas.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        release_local_checkpoint,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        assign_cells,
        ivf_upsert,
    )

    spark = get_spark(app_name="stress-ivf-upsert")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    K, dim = args.cells, args.dim

    def clustered(n, id_offset=0):
        # cluster axis = id % K; spike 1.0 + noise in [-0.02, 0.02]
        vid = F.col("id") + F.lit(id_offset)
        axis = F.pmod(vid, F.lit(K))
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: (
                F.when(d == axis, F.lit(1.0)).otherwise(F.lit(0.0))
                + (
                    F.pmod(F.xxhash64(vid, d), F.lit(4001)).cast("double")
                    - 2000.0
                )
                / 100000.0
            ).cast("float"),
        )
        return spark.range(n).select(
            vid.alias("vec_id"), axis.alias("want_cell"), comps.alias("embedding")
        )

    # the stored index state: analytic centroids (unit axis spikes) —
    # noise means are ~0, so these are the trained quantizer
    cents = spark.createDataFrame(
        [(c, [1.0 if d == c else 0.0 for d in range(dim)]) for c in range(K)],
        "cell long, cvec array<double>",
    ).localCheckpoint(eager=True)

    def accuracy(assigned, truth):
        # untimed correctness leg: assign_cells projects away
        # want_cell, so join it back from the source frame
        row = (
            assigned.join(truth.select("vec_id", "want_cell"), "vec_id")
            .agg(
                F.avg(
                    (F.col("cell") == F.col("want_cell")).cast("double")
                ).alias("a"),
                F.count("*").alias("n"),
            )
            .first()
        )
        return row["a"], row["n"]

    results = []
    for n_base in bases:
        # ONE checkpointed frame sliced by id: base = [0, n_base),
        # delta = [n_base, n_base+delta). (Union of two checkpointed
        # frames trips a Spark LogicalRDD constraint-remap bug — the
        # checkpoint's origin constraints still name the pre-checkpoint
        # range column: 'key not found: id' at optimize time.)
        grown = clustered(n_base + args.delta).localCheckpoint(eager=True)
        delta = grown.filter(F.col("vec_id") >= n_base)
        stamp = load_stamp()
        t0 = time.perf_counter()
        assigned, _info = ivf_upsert(cents, delta)
        n = assigned.count()
        upsert_s = time.perf_counter() - t0
        # the one-shot alternative: re-assign the grown corpus
        t0 = time.perf_counter()
        reassigned = assign_cells(grown, cents, "vec_id", "embedding", 1)
        rn = reassigned.count()
        rebuild_s = time.perf_counter() - t0
        acc, _ = accuracy(assigned, delta)
        racc, _ = accuracy(reassigned, grown)
        results.append({
            "n_base": n_base, "n_delta": args.delta,
            "upsert_s": round(upsert_s, 2), "rebuild_s": round(rebuild_s, 2),
            "amortization": round(rebuild_s / upsert_s, 1),
            "upsert_accuracy": round(acc, 4), "rebuild_accuracy": round(racc, 4),
            **stamp,
        })
        print(json.dumps(results[-1]), flush=True)
        assert acc > 0.999 and racc > 0.999 and n == args.delta and rn == n_base + args.delta
        release_local_checkpoint(grown, allow_projection=True)

    for n_delta in deltas:
        delta = clustered(n_delta, id_offset=max(bases)).localCheckpoint(eager=True)
        stamp = load_stamp()
        t0 = time.perf_counter()
        assigned, _info = ivf_upsert(cents, delta)
        n = assigned.count()
        wall = time.perf_counter() - t0
        acc, _ = accuracy(assigned, delta)
        results.append({
            "n_base": max(bases), "n_delta": n_delta,
            "upsert_s": round(wall, 2), "upsert_accuracy": round(acc, 4),
            **stamp,
        })
        print(json.dumps(results[-1]), flush=True)
        assert acc > 0.999 and n == n_delta
        release_local_checkpoint(delta, allow_projection=True)

    upserts = [r["upsert_s"] for r in results if r["n_delta"] == args.delta]
    print(json.dumps({
        "metric": "ivf_upsert_amortization",
        "upsert_walls_flat_in_base": upserts,
        "rebuild_walls": [r.get("rebuild_s") for r in results if "rebuild_s" in r],
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    main()
