"""Durable pipeline event history (ST7 parity).

The reference's DLT pipelines persist per-update track history — batch
metrics, expectation counters, row counts — as queryable pipeline
events (reference: jobs/bronze_pipeline_config.json:7, DLT event log).
Round 1 only surfaced these in-process via ``observe``/``lastProgress``;
this module lands them in a ``_pipeline_events`` lakehouse table:

- ``record``: append a batch's metrics dict (works for batch jobs —
  pair with ``AppliedExpectations.metrics()``).
- ``listener``: a ``StreamingQueryListener`` that appends every
  micro-batch's ``numInputRows`` plus all observed metrics — attach
  once per session, metrics persist for every stream in the pipeline.

Long schema (one row per metric) so new metric names never migrate the
table; at warehouse scale the table partitions by pipeline and stays
append-only (tiny rows, no compaction pressure).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame

EVENT_SCHEMA = (
    "event_ts timestamp, pipeline string, entity string, "
    "batch_id long, metric string, value long"
)

TABLE = "_pipeline_events"


class PipelineEventLog:
    def __init__(self, lake):
        self.lake = lake

    def record(
        self,
        pipeline: str,
        entity: str,
        metrics: dict[str, int],
        batch_id: int = -1,
    ) -> None:
        if not metrics:
            return
        now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        rows = [
            (now, pipeline, entity, int(batch_id), str(k), int(v))
            for k, v in sorted(metrics.items())
        ]
        df = self.lake.spark.createDataFrame(rows, EVENT_SCHEMA)
        self.lake.append(TABLE, df)

    def read(self) -> DataFrame:
        return self.lake.read(TABLE)

    def listener(self, pipeline: str):
        """StreamingQueryListener persisting per-micro-batch metrics.

        Attach with ``spark.streams.addListener(log.listener("bronze"))``;
        detach with ``removeListener`` when the pipeline stops.
        """
        from pyspark.sql.streaming import StreamingQueryListener

        log = self

        class _Recorder(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                p = event.progress
                metrics: dict[str, int] = {"numInputRows": int(p.numInputRows)}
                for _, row in (p.observedMetrics or {}).items():
                    for k, v in row.asDict().items():
                        if v is not None:
                            metrics[str(k)] = int(v)
                log.record(pipeline, p.name or "query", metrics, p.batchId)

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        return _Recorder()
