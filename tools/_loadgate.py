"""Shared load-context stamps for the stress ladders.

bench.py gates its medians on start loadavg (BENCH_MAX_START_LOAD);
the stress ladders publish single-run walls that SCALING.md's scale
claims cite, so each rung records the same context: a wall measured
from a loaded box (32-thread runs leave a 10+ loadavg tail for
~10 min) is not comparable to one from an idle box, and the stamp is
what lets a reader adjudicate instead of guessing.
"""

from __future__ import annotations

import os

# above this 1-minute loadavg a rung's wall is marked degraded — same
# threshold semantics as bench.py's BENCH_MAX_START_LOAD
MAX_START_LOAD = float(os.environ.get("BENCH_MAX_START_LOAD", "4"))


def load_stamp() -> dict:
    """Per-rung stamp: record IMMEDIATELY BEFORE starting the rung's
    clock. ``degraded`` mirrors bench.py's gate so ladder consumers
    filter on one field."""
    la = os.getloadavg()[0]
    return {
        "loadavg_start": round(la, 2),
        **({"degraded": True} if la > MAX_START_LOAD else {}),
    }


def pinned_rdd_blocks(spark) -> dict:
    """Storage-memory probe: persisted/checkpointed RDD blocks still
    pinned on the executors (localCheckpoint blocks show up here and
    survive unpersist()/GC on this runtime — core/session.py:122).
    Iterative/streaming code that releases its checkpoints correctly
    holds this at zero between rungs/waves."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {
        "pinned_rdds": len(infos),
        "pinned_mem_bytes": int(sum(i.memSize() for i in infos)),
    }
