#!/usr/bin/env python
"""Full oracle differential sweep — the driver-gate mirror at any SF.

Runs EVERY oracle-paired registry query on Spark and its DuckDB twin
against the same parquet tables and reports mismatches. The pytest
differential covers sf0.001 per-test; this tool sweeps the scale the
driver actually grades (default sf0.01) in one session.

Usage: python tools/oracle_sweep.py [sf_dir]
Exit code = number of failing queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.plans.registry import QUERIES
    from ubeardw_databricks_lakehouse_spark.testing.oracle import (
        compare_query,
        duck_con,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    con = duck_con(sf)
    failed = []
    t0 = time.time()
    for q in QUERIES:
        if q.oracle is None:
            continue
        try:
            r = compare_query(spark, con, q.fn, q.oracle, sf)
            # r5 lesson: the driver's value-hash can be red while the
            # local value multiset is exact (DECIMAL/HUGEINT finals) —
            # dtype_match AND driver_safe are part of green, full stop.
            ok = (
                r["cols_match"]
                and r["count_match"]
                and r["values_match"]
                and r["dtype_match"]
                and r["driver_safe"]
            )
            detail = {
                k: r.get(k)
                for k in (
                    "cols_match", "count_match", "values_match",
                    "dtype_match", "driver_safe", "dtype_diffs",
                    "unsafe_cols", "first_diffs",
                )
                if r.get(k) is not None
            }
        except Exception as ex:  # noqa: BLE001 - report, don't die mid-sweep
            ok, detail = False, {"err": str(ex)[:200]}
        if not ok:
            failed.append(q.name)
            print("FAIL", q.name, detail, flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "checked": sum(1 for q in QUERIES if q.oracle),
                "failed": len(failed),
                "sec": round(time.time() - t0),
            }
        ),
        flush=True,
    )
    return len(failed)


if __name__ == "__main__":
    raise SystemExit(main())
