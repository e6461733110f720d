#!/usr/bin/env python
"""Scale stress for the prefix-filter containment dedup path
(operators/dedup.containment_pairs).

Generates N base documents (~60-120 tokens from a small vocabulary, so
shingle document-frequencies are realistically skewed) and plants ~10%
"quote" documents — short contiguous slices of earlier base docs, the
asymmetric-containment case Jaccard misses. Every planted quote has
containment(quote -> source) == 1.0 > threshold, and the prefix filter
is provably lossless, so measured recall MUST be 1.0 at any scale —
this stresses the integer-exact prefix bound (r7 advice fix), not just
wall clock. Prints one JSON line per scale plus the wall exponent.

Usage: python tools/stress_containment.py [--scales 25000,50000]
       [--threshold 0.7] [--n 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOCAB = [f"tok{i:03d}" for i in range(400)]


def gen_docs(n: int, rng: np.random.Generator):
    """(docs, planted) — docs are (doc_id, text); planted is the set of
    (quote_id, source_id) true containment pairs."""
    docs = []
    for i in range(n):
        length = int(rng.integers(60, 121))
        words = rng.choice(VOCAB, size=length)
        docs.append((i, " ".join(words)))
    planted = set()
    n_quotes = n // 10
    srcs = rng.integers(0, n, size=n_quotes)
    for j, s in enumerate(srcs):
        src_words = docs[int(s)][1].split()
        qlen = int(rng.integers(15, 31))
        start = int(rng.integers(0, len(src_words) - qlen))
        qid = n + j
        docs.append((qid, " ".join(src_words[start : start + qlen])))
        planted.add((qid, int(s)))
    return docs, planted


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="25000,50000")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.operators.dedup import (
        containment_pairs,
    )

    spark = get_spark(app_name="stress-containment")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    walls = {}
    for n in scales:
        rng = np.random.default_rng(11)
        docs, planted = gen_docs(n, rng)
        df = (
            spark.createDataFrame(docs, ["doc_id", "text"])
            .repartition(32)
            .cache()
        )
        df.count()

        t0 = time.perf_counter()
        pairs = containment_pairs(
            df, id_col="doc_id", text_col="text",
            n=args.n, threshold=args.threshold,
        ).cache()
        n_pairs = pairs.count()
        wall = time.perf_counter() - t0

        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        recall = len(got & planted) / max(1, len(planted))

        walls[n] = wall
        print(json.dumps({
            "scale": n,
            "total_docs": len(docs),
            "threshold": args.threshold,
            "wall_s": round(wall, 2),
            "n_pairs": n_pairs,
            "planted": len(planted),
            "recall": round(recall, 4),
            "loadavg": [round(x, 2) for x in os.getloadavg()],
        }))
        pairs.unpersist()
        df.unpersist()

    if len(scales) == 2:
        n1, n2 = scales
        e = np.log(walls[n2] / walls[n1]) / np.log(n2 / n1)
        print(json.dumps({"leg": "containment", "exponent": round(float(e), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
