"""Ordering-contract guard for plans/registry.py.

The correctness driver evaluates only the FIRST 50 registry entries per
round. This test pins the rotation discipline: every query that does NOT
yet have green driver evidence (a fully-matching row in the most recent
CORRECTNESS_r*.json) must sit inside the first 50 positions, so it gets
driver-checked next round.
"""

from __future__ import annotations

import json
from pathlib import Path

from ubeardw_databricks_lakehouse_spark.plans.registry import QUERIES

REPO = Path(__file__).resolve().parents[1]
DRIVER_WINDOW = 50


def _latest_green() -> set[str]:
    reports = sorted(REPO.glob("CORRECTNESS_r*.json"))
    green: set[str] = set()
    for report in reports:  # later rounds refresh earlier evidence
        data = json.loads(report.read_text())
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and (row.get("hash_match") or row.get("hash_match") is None)
            )
            if ok:
                green.add(name)
            else:
                green.discard(name)  # regression: needs re-verification
    return green


def test_names_unique() -> None:
    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names))


def test_every_query_has_fn_and_doc() -> None:
    for q in QUERIES:
        assert callable(q.fn), q.name
        assert q.doc, q.name


def test_all_query_outputs_are_scalar_columns(spark) -> None:
    """The driver canonicalizes results with pandas sort_values over
    ALL columns — list/struct/map/binary cells are unhashable and
    crash the harness even for rows-only checks (round-2
    q_user_event_arrays / q_approx_profile). Every registry query must
    therefore emit only scalar columns; typed-array surfaces live on
    the operators and their pytests, not in the registry."""
    from pyspark.sql import types as T

    banned = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    offenders = []
    for q in QUERIES:
        df = q.fn(spark, str(REPO.parent / "testdata" / "sf0.001"))
        for f in df.schema.fields:
            if isinstance(f.dataType, banned):
                offenders.append((q.name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_unverified_queries_inside_driver_window() -> None:
    green = _latest_green()
    window = {q.name for q in QUERIES[:DRIVER_WINDOW]}
    needs_evidence = [q.name for q in QUERIES if q.name not in green]
    outside = [n for n in needs_evidence if n not in window]
    assert not outside, (
        f"{len(outside)} queries lack green driver evidence but sit past "
        f"position {DRIVER_WINDOW}: {outside} — reorder plans/registry.py"
    )
