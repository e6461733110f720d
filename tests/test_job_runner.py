"""DAG runner: topology, retries, skip-on-upstream-failure, and the
reference's 3-task gold batch job end-to-end."""

from __future__ import annotations

import pytest

from ubeardw_databricks_lakehouse_spark.jobs.runner import (
    JobTask,
    gold_batch_job,
    run_job,
)


def test_dag_order_skip_and_retry():
    calls = []
    flaky = {"left": 2}

    def flaky_fn():
        calls.append("b")
        if flaky["left"] > 0:
            flaky["left"] -= 1
            raise RuntimeError("transient")
        return "ok"

    tasks = [
        JobTask("c", lambda: calls.append("c"), depends_on=("b",)),
        JobTask("a", lambda: calls.append("a")),
        JobTask("b", flaky_fn, depends_on=("a",), max_retries=2),
    ]
    report = run_job(tasks)
    assert report.succeeded
    assert report.tasks["b"].attempts == 3
    assert calls[0] == "a" and calls[-1] == "c"


def test_failure_skips_transitive_dependents():
    def boom():
        raise ValueError("nope")

    tasks = [
        JobTask("a", boom),
        JobTask("b", lambda: 1, depends_on=("a",)),
        JobTask("c", lambda: 2, depends_on=("b",)),
        JobTask("d", lambda: 3),  # independent — still runs
    ]
    report = run_job(tasks)
    assert not report.succeeded
    assert report.tasks["a"].status == "failed"
    assert "ValueError" in report.tasks["a"].error
    assert report.tasks["b"].status == "skipped"
    assert report.tasks["c"].status == "skipped"
    assert report.tasks["d"].status == "success"


def test_cycle_and_unknown_dep_rejected():
    with pytest.raises(ValueError, match="cycle"):
        run_job([
            JobTask("a", lambda: 1, depends_on=("b",)),
            JobTask("b", lambda: 2, depends_on=("a",)),
        ])
    with pytest.raises(ValueError, match="unknown"):
        run_job([JobTask("a", lambda: 1, depends_on=("zz",))])


def test_gold_batch_job_dag(spark, tmp_path):
    """The reference's batch_job.json DAG: gold -> optimize -> validate."""
    from ubeardw_databricks_lakehouse_spark.pipelines.silver import (
        silver_courier,
        silver_eater,
        silver_merchant,
        silver_trip_events,
    )
    from ubeardw_databricks_lakehouse_spark.sources.debezium import to_bronze
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
    from ubeardw_databricks_lakehouse_spark.testing.fixtures import raw_kafka_df

    lake = Lakehouse(spark, str(tmp_path))
    frames = {
        name: fn(to_bronze(raw_kafka_df(spark, name), name))
        for name, fn in [
            ("eater", silver_eater), ("merchant", silver_merchant),
            ("courier", silver_courier), ("trip_events", silver_trip_events),
        ]
    }
    report = run_job(gold_batch_job(lake, frames, "2024-12-02 02:00:00"))
    assert report.succeeded, {k: v.error for k, v in report.tasks.items()}
    assert list(report.tasks) == [
        "gold_dimensions_scd2", "optimize_gold_tables",
        "data_quality_validation",
    ]
    assert not any(r.over_budget for r in report.tasks.values())
    # the validation task's report shows every gold check passed
    val = report.tasks["data_quality_validation"].value
    assert val["status"] == "PASS", val
