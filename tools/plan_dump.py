#!/usr/bin/env python
"""Dump `.explain("formatted")` for registry queries to files.

Usage:
  python tools/plan_dump.py --out plans/r13 --suffix _before q_a q_b ...
  python tools/plan_dump.py --out plans/r13 --suffix _before --headline

Writes <out>/<query><suffix>.txt for each query, at
$SPARK_GRAFT_SF_DIR (default sf0.1 — the timed scale, so plan shapes
match what the bench measures: AQE initial plan, join strategies,
PushedFilters/ReadSchema as planned at that size).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.plans.registry import QUERIES

    args = sys.argv[1:]
    out_dir = "plans/r13"
    suffix = "_before"
    names: list[str] = []
    use_headline = False
    i = 0
    while i < len(args):
        if args[i] == "--out":
            out_dir = args[i + 1]
            i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif args[i] == "--headline":
            use_headline = True
            i += 1
        else:
            names.append(args[i])
            i += 1
    if use_headline:
        import bench

        names = list(bench.HEADLINE) + names

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    by_name = {q.name: q for q in QUERIES}
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    for n in names:
        if n not in by_name:
            print(f"unknown query: {n}", file=sys.stderr)
            continue
        df = by_name[n].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{n}{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {n} @ {sf_dir}\n")
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main()
