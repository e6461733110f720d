#!/usr/bin/env python
"""Plan auditor — print the physical-plan properties the SCALING.md
claims rest on, for any registry query.

Usage: python tools/plan_audit.py q01_pricing_summary [q03_... ...]
       python tools/plan_audit.py --all          # every registry query
Flags per query: pushed filters / read schema of each scan, join
strategies, TakeOrderedAndProject, single-partition windows/exchanges
(the anti-pattern), and whole-stage-codegen span count.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(spark, name: str, fn, sf_dir: str) -> None:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    fmt = buf.getvalue()
    print(f"== {name} ==")
    for line in fmt.splitlines():
        s = line.strip()
        if s.startswith(("PushedFilters", "ReadSchema")):
            print("  ", s[:140])
    joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
    if joins:
        print("   joins:", ", ".join(j for j in joins if "Join" in j))
    for marker, label in [
        ("TakeOrderedAndProject", "top-k = TakeOrderedAndProject"),
        ("CartesianProduct", "!! CartesianProduct"),
    ]:
        if marker in plan:
            print("  ", label)
    if "SinglePartition" in plan:
        print("   !! SinglePartition exchange (global window/sort?)")
    # codegen-span counts only exist on the AQE-final plan (post-
    # execution); pre-execution they would always read 0 — omitted.


def main() -> None:
    from ubeardw_databricks_lakehouse_spark.core.session import (
        get_spark,
        ship_package,
    )
    from ubeardw_databricks_lakehouse_spark.plans.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    wanted = sys.argv[1:]
    by_name = {q.name: q for q in QUERIES}
    names = (
        [q.name for q in QUERIES]
        if wanted == ["--all"]
        else (wanted or ["q01_pricing_summary"])
    )
    spark = get_spark()
    ship_package(spark)
    for n in names:
        if n not in by_name:
            print(f"unknown query: {n}")
            continue
        audit(spark, n, by_name[n].fn, sf_dir)


if __name__ == "__main__":
    main()
