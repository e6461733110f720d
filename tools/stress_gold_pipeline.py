#!/usr/bin/env python
"""Scale rung for the END-TO-END gold pipeline (pipelines/gold.run_gold_job)
at a size where it measures the engine, not the scheduler — r13 verdict
#8: the 13k-event bench entry is latency-bound (phase profile is cache
materialization order + job scheduling), so the r13 Arrow-fixture and
footer-count changes could not be seen there. This rung drives the same
CDC → bronze → silver → gold star build at 100k–1M events and A/Bs the
driver→JVM fixture path (Arrow pandas frame vs pickled rows) ARM-
INTERLEAVED within one session, so host steal bursts hit both arms
(the r13 measurement method).

What the Arrow arm isolates: `testing.fixtures.raw_kafka_df` ships the
synthesized Debezium envelopes driver→JVM once per entity; at 13k
events that transfer is noise, at 1M events the pickled-row path's
per-row type verification is a serial driver cost the Arrow batch
skips. Everything downstream (bronze parse, silver, SCD2 dims, fact)
is identical plans in both arms.

Usage: python tools/stress_gold_pipeline.py [--trips 15000] [--reps 3]
       (2000 trips ≈ 13k events; 15000 ≈ 100k events; 150000 ≈ 1M)
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
    ap.add_argument("--trips", type=int, default=15000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from ubeardw_databricks_lakehouse_spark.core.session import get_spark, ship_package
    from ubeardw_databricks_lakehouse_spark.pipelines.gold import run_gold_job
    from ubeardw_databricks_lakehouse_spark.pipelines.silver import (
        silver_courier,
        silver_eater,
        silver_merchant,
        silver_trip_events,
    )
    from ubeardw_databricks_lakehouse_spark.sources.debezium import to_bronze
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
    from ubeardw_databricks_lakehouse_spark.testing.fixtures import raw_kafka_df
    from ubeardw_databricks_lakehouse_spark.testing.generator import generate

    spark = get_spark(app_name="stress-gold-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    t0 = time.perf_counter()
    data = generate(n_trips=args.trips)
    n_events = len(data["trip_events"])
    gen_s = time.perf_counter() - t0

    def run(arrow: bool) -> dict:
        t = {}
        t0 = time.perf_counter()
        frames = {
            e: raw_kafka_df(spark, e, rows=data[e], arrow=arrow)
            for e in ("eater", "merchant", "courier", "trip_events")
        }
        # force the driver→JVM transfer + bronze parse NOW so the
        # fixture arm is separable from the (identical) gold plans
        for e, df in frames.items():
            to_bronze(df, e).write.mode("overwrite").format("noop").save()
        t["fixture_and_bronze_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        with tempfile.TemporaryDirectory() as lake_dir:
            lake = Lakehouse(spark, lake_dir)
            counts = run_gold_job(
                lake,
                silver_eater(to_bronze(frames["eater"], "eater")),
                silver_merchant(to_bronze(frames["merchant"], "merchant")),
                silver_courier(to_bronze(frames["courier"], "courier")),
                silver_trip_events(to_bronze(frames["trip_events"], "trip_events")),
                effective_ts="2024-12-02 02:00:00",
                collect_counts=True,
            )
        t["gold_s"] = round(time.perf_counter() - t0, 3)
        t["fact_rows"] = counts.get("trip_fact") if counts else None
        return t

    rows = []
    for rep in range(args.reps):
        for arrow in (True, False):  # interleaved arms, one session
            r = run(arrow)
            r.update({"rep": rep, "arrow": arrow})
            rows.append(r)
            print(json.dumps(r))

    def med(vals):
        vals = sorted(vals)
        mid = len(vals) // 2
        return vals[mid] if len(vals) % 2 else (vals[mid - 1] + vals[mid]) / 2

    summary = {
        "n_trips": args.trips,
        "n_events": n_events,
        "generate_s": round(gen_s, 3),
        "loadavg": list(os.getloadavg()),
    }
    for arm in (True, False):
        sel = [r for r in rows if r["arrow"] == arm]
        summary[f"{'arrow' if arm else 'rows'}_fixture_median_s"] = med(
            [r["fixture_and_bronze_s"] for r in sel]
        )
        summary[f"{'arrow' if arm else 'rows'}_gold_median_s"] = med(
            [r["gold_s"] for r in sel]
        )
    facts = {r["fact_rows"] for r in rows}
    summary["fact_rows_identical_across_arms"] = len(facts) == 1
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
