#!/usr/bin/env python
"""Throughput stress for the streaming near-dup maintenance
(streaming/incremental_neardup.start_incremental_neardup).

Bootstraps a base corpus wave, then streams successive delta waves of
equal size through the foreachBatch pipeline, timing each wave
end-to-end (stream start -> awaitTermination: banding, index probe,
verify, and all three keyed MERGE writes). Docs are the
hash-derived planted-near-dup corpus of tools/stress_neardup_upsert
(each delta doc clones a distinct base doc's prefix), so per-wave
pair counts double-check recall while the clock runs.

What to expect, by design: the COMPUTE legs are O(delta) —
tools/stress_neardup_upsert shows the operator near-flat in base —
and with ``--state-buckets B`` (r13) the STORAGE legs are pruned
MERGEs too: each state table is bucket-partitioned on a key-derived
hash column, so a wave rewrites only the buckets it touches instead
of the whole table (Lakehouse.upsert's partition-pruned path — the
parquet twin of Delta's file-pruned MERGE). At ``--state-buckets 0``
(legacy layout) every keyed MERGE rewrites its table, so wave walls
carry an O(corpus) write term; this tool keeps that split measured
instead of asserted — wave walls are reported next to the corpus
size, each with a loadavg stamp (tools/_loadgate).

Memory gate (r13): after every wave the executor storage is asserted
EMPTY (``pinned_rdd_blocks``) — the per-batch localCheckpoint pins
must be released by the stream itself, or a forever-running pipeline
accretes one dead delta-sized block per micro-batch; run with
``--waves 100`` to pin the long-haul behavior.

Usage: python tools/stress_streaming_neardup.py --base 500000 --wave 50000 --waves 4
       python tools/stress_streaming_neardup.py --base 200000 --wave 2000 --waves 100 --state-buckets 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=500000)
    ap.add_argument("--wave", type=int, default=50000)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=1000)
    ap.add_argument("--state-buckets", type=int, default=0,
                    help="bucket-partition the state tables (pruned MERGEs)")
    args = ap.parse_args()

    from _loadgate import load_stamp, pinned_rdd_blocks

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
    from ubeardw_databricks_lakehouse_spark.streaming.incremental_neardup import (
        start_incremental_neardup,
    )

    spark = get_spark(app_name="stress-streaming-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def tok(src, j):
        return F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit("tok"), src, F.lit(j)), F.lit(args.vocab))
            .cast("string"),
        )

    def base_docs(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[tok(F.col("id"), j) for j in range(args.tokens)])
            .alias("text"),
        )

    def delta_docs(n_delta, id_offset, n_base):
        src = F.pmod(F.xxhash64(F.lit("src"), F.col("id") + id_offset), F.lit(n_base))
        return spark.range(n_delta).select(
            (F.col("id") + F.lit(id_offset)).alias("doc_id"),
            F.concat_ws(
                " ",
                *[tok(src, j) for j in range(args.tokens - 1)],
                F.lit("wdelta"),
            ).alias("text"),
        )

    tmp = tempfile.mkdtemp(prefix="stress_stream_nd_")
    lake = Lakehouse(spark, os.path.join(tmp, "lake"))

    def run_wave(df, n):
        src = os.path.join(tmp, f"wave{n}")
        df.write.mode("overwrite").parquet(os.path.join(src, "data"))
        schema = spark.read.parquet(os.path.join(src, "data")).schema
        stream = spark.readStream.schema(schema).parquet(os.path.join(src, "data"))
        stamp = load_stamp()
        t0 = time.perf_counter()
        q = start_incremental_neardup(
            spark, stream, lake,
            checkpoint=os.path.join(tmp, f"ckpt{n}"),
            hash_fn="xxhash64",
            state_buckets=args.state_buckets,
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0
        # the memory gate: the stream must have released its per-batch
        # localCheckpoint pins — anything left accretes forever
        pinned = pinned_rdd_blocks(spark)
        assert pinned["pinned_rdds"] == 0, (
            f"wave {n} leaked {pinned['pinned_rdds']} pinned RDD blocks "
            f"({pinned['pinned_mem_bytes']} bytes) — localCheckpoint not released"
        )
        return wall, stamp

    # wave 0 bootstraps the corpus (its wall includes hashing the base)
    results = []
    wall0, stamp0 = run_wave(base_docs(args.base), 0)
    results.append({"wave": 0, "docs": args.base, "wall_s": round(wall0, 2),
                    "corpus_after": args.base, "docs_per_s": int(args.base / wall0),
                    **stamp0})
    print(json.dumps(results[-1]), flush=True)

    offset = args.base
    prev_pairs = (
        lake.read("neardup_pairs").count() if lake.exists("neardup_pairs") else 0
    )
    for w in range(1, args.waves + 1):
        wall, stamp = run_wave(delta_docs(args.wave, offset, args.base), w)
        offset += args.wave
        n_pairs = lake.read("neardup_pairs").count()
        # expected new pairs: each delta doc pairs with its base source
        # (args.wave), plus birthday collisions — two delta docs cloning
        # the SAME base source are near-dups of each other: within-wave
        # ~wave^2/(2*base), cross-wave vs the (w-1) earlier delta waves
        # ~(w-1)*wave^2/base
        expect = args.wave * (
            1 + args.wave / (2 * args.base) + (w - 1) * args.wave / args.base
        )
        recall = (n_pairs - prev_pairs) / expect
        results.append({
            "wave": w, "docs": args.wave, "wall_s": round(wall, 2),
            "corpus_after": offset, "docs_per_s": int(args.wave / wall),
            "new_pairs": n_pairs - prev_pairs,
            "recall_vs_expected": round(recall, 4),
            **stamp,
        })
        print(json.dumps(results[-1]), flush=True)
        assert 0.9 < recall < 1.1, "pair count off the analytic expectation"
        prev_pairs = n_pairs

    deltas = [r for r in results if r["wave"] >= 1]
    print(json.dumps({
        "metric": "streaming_neardup_wave_walls",
        "state_buckets": args.state_buckets,
        "wave_walls_s": [r["wall_s"] for r in deltas],
        "docs_per_s_last": deltas[-1]["docs_per_s"],
        "corpus_final": offset,
        "pinned_after_run": pinned_rdd_blocks(spark),
        "loadavg": list(os.getloadavg()),
    }))


if __name__ == "__main__":
    main()
