#!/usr/bin/env python
"""Volume stress for the Structured Streaming medallion leg
(streaming/pipeline.run_entity_pipeline — file-CDC twin of the Kafka
source, ST1-ST5): N CDC envelope files through readStream -> bronze
table -> silver table with checkpoints, availableNow.

The batch path has a 25x volume number (SCALING.md round-3); this is
the STREAMING twin: same parse/dedup lineage, but through two
checkpointed streaming queries with exactly-once file tracking.
Events are made globally unique across files (numeric id offsets), so
the silver count proves nothing was dropped or double-processed;
throughput is end-to-end events/sec including checkpoint commits.

Usage: python tools/stress_streaming.py [--files 25] [--trips 2000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=25)
    ap.add_argument("--trips", type=int, default=2000)
    args = ap.parse_args()

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.streaming.pipeline import (
        run_entity_pipeline,
    )
    from ubeardw_databricks_lakehouse_spark.testing.fixtures import debezium_envelope
    from ubeardw_databricks_lakehouse_spark.testing.generator import generate

    spark = get_spark(app_name="stress-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    events = generate(n_trips=args.trips)["trip_events"]
    per_file = len(events)
    work = tempfile.mkdtemp(prefix="stream_stress_")
    src = os.path.join(work, "cdc")
    out = os.path.join(work, "lake")
    os.makedirs(src)

    offset = 10_000_000
    total = 0
    for k in range(args.files):
        with open(os.path.join(src, f"batch{k:04d}.jsonl"), "w") as f:
            for i, r in enumerate(events):
                row = dict(r)
                # numeric/suffix offsets keep every event globally
                # unique so dedup keeps all of them — the count IS the
                # exactly-once check
                row["event_id"] = r["event_id"] + k * offset
                row["trip_id"] = f"{r['trip_id']}-f{k}"
                row["order_id"] = f"{r['order_id']}-f{k}"
                rec = {
                    "kafka_key": str(row["event_id"]),
                    "raw_value": debezium_envelope(
                        "trip_events", row, op="c", ts_ms=row.get("created_at") or 0
                    ),
                    "kafka_topic": "ubear.public.trip_events",
                    "kafka_partition": k % 3,
                    "kafka_offset": total + i,
                    "kafka_timestamp": None,
                }
                f.write(json.dumps(rec) + "\n")
        total += per_file

    t0 = time.perf_counter()
    run_entity_pipeline(spark, src, "trip_events", out, available_now=True)
    wall = time.perf_counter() - t0

    silver = spark.read.parquet(os.path.join(out, "silver_trip_events"))
    n_silver = silver.count()
    result = {
        "metric": "streaming_medallion_events_per_sec",
        "value": round(total / wall),
        "events": total,
        "files": args.files,
        "wall_s": round(wall, 2),
        "silver_rows": n_silver,
        "exactly_once": n_silver == total,
        "loadavg": list(os.getloadavg()),
    }
    print(json.dumps(result))
    shutil.rmtree(work, ignore_errors=True)
    assert n_silver == total, (n_silver, total)


if __name__ == "__main__":
    main()
