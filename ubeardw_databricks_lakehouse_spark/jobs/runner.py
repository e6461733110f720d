"""Declarative batch-job DAG runner.

Re-expresses the reference's Databricks job spec
(``jobs/batch_job.json``: a 3-task DAG gold → optimize → validate with
per-task ``timeout_seconds``, ``depends_on`` and a job-level timeout)
as plain code over any SparkSession — no workflow service required.

Semantics mirrored from the reference spec:
- tasks run in dependency order; a failed task marks every transitive
  dependent ``skipped`` (Databricks' default skip-on-upstream-failure);
- per-task retries (the job runner's ``max_retries``);
- per-task wall-clock budgets are recorded and overruns flagged —
  budgets in the reference are upper bounds, not kill switches
  (`batch_job.json:13,33,52,69`), so the runner reports rather than
  kills;
- the run report (status/seconds/attempts per task) is the analogue of
  the job-run event payload, and can be appended to the pipeline event
  log (`streaming/events.py`) for durable history.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class JobTask:
    name: str
    fn: Callable[[], Any]
    depends_on: tuple[str, ...] = ()
    timeout_s: float | None = None
    max_retries: int = 0


@dataclass
class TaskResult:
    status: str  # "success" | "failed" | "skipped"
    seconds: float = 0.0
    attempts: int = 0
    over_budget: bool = False
    error: str | None = None
    value: Any = None


@dataclass
class JobReport:
    tasks: dict[str, TaskResult] = field(default_factory=dict)

    @property
    def succeeded(self) -> bool:
        return all(r.status == "success" for r in self.tasks.values())


def _topo_order(tasks: list[JobTask]) -> list[JobTask]:
    by_name = {t.name: t for t in tasks}
    if len(by_name) != len(tasks):
        raise ValueError("duplicate task names")
    order: list[JobTask] = []
    state: dict[str, int] = {}  # 0=visiting, 1=done

    def visit(t: JobTask) -> None:
        if state.get(t.name) == 1:
            return
        if state.get(t.name) == 0:
            raise ValueError(f"dependency cycle through {t.name}")
        state[t.name] = 0
        for dep in t.depends_on:
            if dep not in by_name:
                raise ValueError(f"{t.name} depends on unknown task {dep}")
            visit(by_name[dep])
        state[t.name] = 1
        order.append(t)

    for t in tasks:
        visit(t)
    return order


def run_job(tasks: list[JobTask]) -> JobReport:
    """Execute the DAG; never raises for task failures — the report
    carries the outcome (callers decide whether to raise, matching the
    validation task's raise-on-failure policy living IN the task)."""
    report = JobReport()
    for task in _topo_order(tasks):
        failed_deps = [
            d for d in task.depends_on
            if report.tasks[d].status != "success"
        ]
        if failed_deps:
            report.tasks[task.name] = TaskResult(status="skipped")
            continue
        result = TaskResult(status="failed")
        for attempt in range(task.max_retries + 1):
            result.attempts = attempt + 1
            t0 = time.perf_counter()
            try:
                result.value = task.fn()
                result.seconds = round(time.perf_counter() - t0, 3)
                result.status = "success"
                result.error = None
                break
            except Exception as exc:  # noqa: BLE001 — report, don't mask which
                result.seconds = round(time.perf_counter() - t0, 3)
                result.error = f"{type(exc).__name__}: {exc}"
        if task.timeout_s is not None and result.seconds > task.timeout_s:
            result.over_budget = True
        report.tasks[task.name] = result
    return report


def gold_batch_job(
    lake,
    silver_frames: dict,
    effective_ts: str,
) -> list[JobTask]:
    """The reference's daily batch DAG (batch_job.json): gold build →
    optimize → validate, with its timeout budgets."""
    from ..maintenance.optimize import optimize_gold_tables
    from ..maintenance.validation import validate_gold
    from ..pipelines.gold import run_gold_job

    return [
        JobTask(
            "gold_dimensions_scd2",
            lambda: run_gold_job(
                lake,
                silver_frames["eater"],
                silver_frames["merchant"],
                silver_frames["courier"],
                silver_frames["trip_events"],
                effective_ts=effective_ts,
                collect_counts=False,
            ),
            timeout_s=3600.0,
        ),
        JobTask(
            "optimize_gold_tables",
            lambda: optimize_gold_tables(lake),
            depends_on=("gold_dimensions_scd2",),
            timeout_s=1800.0,
        ),
        JobTask(
            "data_quality_validation",
            lambda: validate_gold(lake),
            depends_on=("optimize_gold_tables",),
            timeout_s=1200.0,
        ),
    ]
