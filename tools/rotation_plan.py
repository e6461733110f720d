#!/usr/bin/env python
"""Mechanize the per-round _WINDOW rotation (plans/registry.py).

Every round starts with the same hand computation: which entries'
evidence falls off the freshness horizon once the NEXT CORRECTNESS
report lands, which never-graded entries (_DEFERRED_NEW) must
promote, and which oldest-evidence cohort fills the free slots —
definition-order tiebreak. This tool does the ledger math the
forward-looking staleness test (tests/test_registry_order.py)
enforces, SIMULATES the next report (it will refresh exactly the
current window), and prints a paste-ready _WINDOW list for the next
round plus the demand ledger.

Run it right after the driver drops CORRECTNESS_r{N}.json; the
printed list is the rotation the staleness test will demand.

Usage: python tools/rotation_plan.py
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = Path(__file__).resolve().parents[1]
DRIVER_WINDOW = 50


def _row_ok(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return (
        row.get("err") is None
        and bool(row.get("rows_match"))
        and (row.get("hash_match") or row.get("hash_match") is None)
    )


def definition_order() -> list[str]:
    """QueryDef order in the registry SOURCE (the literal list) — the
    rotation tiebreak; the module reorders QUERIES at import time, so
    the runtime order can't be used."""
    src = (REPO / "ubeardw_databricks_lakehouse_spark/plans/registry.py").read_text()
    return re.findall(r'QueryDef\(\s*"([a-z0-9_]+)"', src)


def main() -> None:
    from ubeardw_databricks_lakehouse_spark.plans.registry import (
        _DEFERRED_NEW,
        QUERIES,
    )

    names_def = definition_order()
    assert set(names_def) == {q.name for q in QUERIES}, "source parse drift"

    reports = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not reports:
        print("no CORRECTNESS reports yet — nothing to rotate")
        return
    latest: dict[str, str] = {}
    for report in reports:
        data = json.loads(report.read_text())
        for name, row in data.items():
            if isinstance(row, dict) and _row_ok(row):
                latest[name] = report.name

    horizon = max(2, math.ceil(len(QUERIES) / DRIVER_WINDOW))
    # The staleness test's EXACT semantics (test_no_query_goes_stale_
    # unchecked): with the latest report on disk, fresh = the last
    # (horizon-1) EXISTING reports; any entry whose newest green sits
    # outside that set must be in the window NOW so the next report
    # refreshes it. (An earlier revision of this tool simulated one
    # extra report ahead and marked the whole next-oldest cohort "must"
    # too — at 174 entries that demanded 74 > 50 slots and, worse,
    # truncated the never-graded lane out of the window, inverting the
    # grading contract. The designed cadence is: that next-oldest
    # cohort goes red at the NEXT round boundary and rotates then.)
    fresh = {r.name for r in reports[-(horizon - 1):]}

    must = [n for n in names_def if n in latest and latest[n] not in fresh]
    never = [n for n in names_def if n not in latest]
    # oldest-evidence-first fill, definition-order tiebreak inside a round
    remaining = [
        n for n in names_def
        if n not in set(must) and n not in set(never)
    ]
    remaining.sort(key=lambda n: (latest[n], names_def.index(n)))

    window = must + never
    free = DRIVER_WINDOW - len(window)
    if free < 0:
        print(f"!! demand {len(window)} > {DRIVER_WINDOW} slots — "
              f"horizon structurally violated; widen or split")
    window = (window + remaining[:max(free, 0)])[:DRIVER_WINDOW]

    # forecast: entries NOT in this window whose evidence falls off the
    # horizon once the next report lands = the floor of next round's
    # demand (they go red at that boundary by design and rotate then)
    fresh_after_next = {r.name for r in reports[-(horizon - 2):]} if (
        horizon > 2) else set()
    next_demand = [
        n for n in names_def
        if n not in set(window)
        and n in latest and latest[n] not in fresh_after_next
    ]

    by_round: dict[str, int] = {}
    for n in window:
        by_round[latest.get(n, "never")] = by_round.get(
            latest.get(n, "never"), 0) + 1
    print(json.dumps({
        "registry": len(QUERIES), "horizon": horizon,
        "stale_now": len(must),
        "never_graded": len(never),
        "deferred_new": list(_DEFERRED_NEW),
        "fill": max(free, 0),
        "window_by_evidence_round": by_round,
        "next_round_demand_floor": len(next_demand),
    }, indent=2))
    print("\n_WINDOW: list[str] = [")
    for i in range(0, len(window), 2):
        print("    " + "".join(f'"{n}", ' for n in window[i:i + 2]).rstrip())
    print("]")


if __name__ == "__main__":
    main()
