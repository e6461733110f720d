"""SparkSession factory tuned for the lakehouse workload.

The reference runs on Databricks with AQE + partition coalescing on
(reference: jobs/gold_pipeline_config.json:40-47) and Delta
optimizeWrite/autoCompact (jobs/batch_job.json:85-86). We reproduce the
engine-level knobs on OSS Spark and, when the ``delta-spark`` package is
importable, enable the Delta Lake catalog; otherwise the storage layer
falls back to parquet tables (see storage/lakehouse.py).

Scale notes (100 TB design intent):
- AQE is the primary runtime re-planner: skew-join splitting, partition
  coalescing, and dynamic broadcast conversion are all enabled.
- ``spark.sql.shuffle.partitions`` defaults to cores*2 locally; on a
  1000-executor cluster set it (or rely on AQE coalescing from a high
  initial number, e.g. 2000-8000 for 100 TB shuffles).
- ANSI mode is left ON (Spark 4 default): the engine uses try_* /
  explicit guards where the CDC input may be malformed, so correctness
  does not depend on silent-null casts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Python UDF/pandas_udf closures reference this module by name; when
    the SparkSession was created by an external driver (whose
    PYTHONPATH doesn't include the repo), workers fail to unpickle
    them. Zip the package once per session and addPyFile it — Spark
    distributes the zip and prepends it to every worker's sys.path.
    """
    sc = spark.sparkContext
    if getattr(sc, "_ubeardw_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg_name = os.path.basename(pkg_root)
    fd, zip_path = tempfile.mkstemp(suffix=".zip", prefix="ubeardw_pkg_")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        pkg_name, os.path.relpath(full, pkg_root)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._ubeardw_pkg_shipped = True


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except Exception:
        return False


def get_spark(
    app_name: str = "ubeardw-lakehouse",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: coalesce post-shuffle partitions, split skewed
        # joins, convert SMJ->BHJ when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas_udf / toPandas (the LLM-pipeline operators are
        # Arrow-batched; row-at-a-time Python is banned from the hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims in this warehouse are small; 64 MB keeps
        # dim joins map-side at sf0.1 and on real clusters.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # driver testdata ships TIMESTAMP(NANOS) parquet; read as long
        # and truncate to micros in plans.common.normalize_event_ts
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if delta_available():
        builder = (
            builder.config(
                "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
            ).config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def release_local_checkpoint(df, allow_projection: bool = False) -> bool:
    """Free the pinned blocks of an eagerly ``localCheckpoint``-ed
    DataFrame NOW instead of waiting for the JVM ContextCleaner.

    ``df.unpersist()`` does NOT release checkpoint blocks (it targets
    the cache manager, and a checkpointed frame is a LogicalRDD, not
    an InMemoryRelation) and dropping the Python reference frees them
    only on an eventual GC cycle — measured on this runtime: blocks
    still pinned after del + gc.collect() + System.gc(). Long
    iterative loops (k-core peel, CC rounds, multi-rung stress
    ladders) that hold every superseded round's edge set this way
    exhaust unified memory at the 10^7-row scale (the r10 PPS-ladder
    GC thrash, and the kcore 32M OOM that motivated this helper).

    Only call on a frame that is truly dead — a checkpointed frame
    read after release recomputes from an EMPTY lineage and returns
    wrong results. Returns True when blocks were actually released,
    False for a no-op. Accepts the checkpoint frame itself OR — with
    ``allow_projection=True`` — a plan over exactly one checkpoint
    leaf (e.g. the ``.drop()`` projection an iterative loop carries —
    caught by pytest: the root-only check silently no-opped on those
    from round 2 on); multi-leaf plans are always left alone (another
    leaf might be live).

    ``allow_projection`` defaults to False because the single-leaf
    path cannot tell whether that leaf checkpoint is SHARED with
    another live DataFrame (two projections of one checkpoint, one
    still in use): releasing it makes later reads of the surviving
    frame silently recompute from the empty lineage. Opt in only when
    the caller owns every derivation of the checkpoint — as the
    in-repo iterative loops do, each releasing a round-private frame
    it created and superseded itself.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
            return True
        leaves = plan.collectLeaves()
        if allow_projection and leaves.size() == 1:
            leaf = leaves.apply(0)
            if leaf.getClass().getName().endswith(".LogicalRDD"):
                leaf.rdd().unpersist(False)
                return True
    except Exception:
        pass
    return False


def resolve_broadcast_rows(spark, bytes_per_row: int, hydration: int = 4) -> int:
    """Session-derived ROW budget for the iterative operators' explicit
    broadcasts (pagerank's rank vector, LPA's label vector, the
    triangle wedge probes, CC's endpoint labels) — r13 verdict #7: the
    former 4M-row literals assumed one memory geometry; derive the gate
    from the session the way ``resolve_auto_join_hint`` does, so small
    executors shrink it and big ones relax it.

    Derivation (guide §3.1/§5):

    - broadcast disabled for the session
      (``spark.sql.autoBroadcastJoinThreshold`` < 0) -> 0: the operator
      falls back to its shuffle path — the explicit hint must respect
      the session-wide opt-out (pinned by a plan test).
    - otherwise ``budget = max(threshold, heap/32)`` bytes: never less
      than what the session already authorizes the planner to broadcast
      on its own, at most ~3% of the executor heap per relation (a
      hydrated hash relation must coexist with execution memory; guide
      §3.1 "a few hundred MB is usually fine, multiple GB is asking
      for OOMs"), capped well under Spark's 8 GB broadcast hard limit.
    - rows = budget / (``bytes_per_row`` × ``hydration``): hydration 4x
      covers the unsafe-row + hash-relation overhead on narrow rows.

    At the shipped 8 GB local session this lands within ~5% of the r13
    4M-row literal for 16-byte edge rows — same bench behavior, now a
    function of the config instead of a constant tuned to it.
    """
    try:
        thr = int(
            spark._jsparkSession.sessionState()
            .conf()
            .autoBroadcastJoinThreshold()
        )
    except Exception:
        thr = 10 * 1024 * 1024  # planner default — assume broadcasts allowed
    if thr < 0:
        return 0
    jvm = spark.sparkContext._jvm
    try:
        mem_str = spark.conf.get("spark.executor.memory")
        heap = int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(mem_str))
    except Exception:
        # local mode: the driver JVM IS the executor
        heap = int(jvm.java.lang.Runtime.getRuntime().maxMemory())
    budget = min(max(thr, heap // 32), 2 << 30)
    return budget // (bytes_per_row * max(1, hydration))


def resolve_auto_join_hint(build_df) -> str | None:
    """Size-trigger for the exploded-join operators' ``join_hint="AUTO"``
    (radius_join, range_join_binned — r12 verdict #4: the derived knobs
    should be the shipping default, engaged only where size warrants).

    Uses Catalyst's own estimate (``optimizedPlan().stats().sizeInBytes``
    — free, no job) of the BUILD side:

    - at or below ``spark.sql.autoBroadcastJoinThreshold``: return None.
      The planner will broadcast, which is optimal at this size; hinting
      SHUFFLE_HASH here would force a shuffle where none is needed.
    - above it (or with broadcast disabled, threshold < 0): return
      ``"SHUFFLE_HASH_AUTO"`` — the measured 64M-scale fast path (the
      default SortMergeJoin's wall is the exploded-side SORT; see
      operators/spatial.py). Its sizing count() is amortized against a
      join this size by definition of the trigger.

    Estimates can be wrong (a selective filter under a raw scan inflates
    sizeInBytes -> the join is hash-partitioned when broadcast would
    have done; harmless, just a shuffle). Callers wanting exact control
    pass an explicit hint instead of AUTO.
    """
    try:
        size = int(str(
            build_df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ))
        thr = int(
            build_df.sparkSession._jsparkSession.sessionState()
            .conf()
            .autoBroadcastJoinThreshold()
        )
    except Exception:
        return "SHUFFLE_HASH_AUTO"  # no estimate -> assume big (safe at scale)
    if 0 <= size <= thr:
        return None
    return "SHUFFLE_HASH_AUTO"
