"""Streaming incremental IVF maintenance: embedding waves feeding the
cell-partitioned assignment table via foreachBatch must converge to
the exact batch assignment, search over the maintained state must
equal rebuild-then-search, redelivery must be idempotent, the drift
ledger must fire on an off-quantizer ingest, and the layout must
deliver pruned MERGEs + dynamically-pruned search scans."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.operators.similarity import (
    _centroids,
    assign_cells,
    ivf_search,
)
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
from ubeardw_databricks_lakehouse_spark.streaming.incremental_ivf import (
    bootstrap_ivf_state,
    retrain_ivf,
    search_maintained_ivf,
    start_incremental_ivf,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def _run_wave(spark, lake, tmp_path, wave_df, n, checkpoint=None, **kw):
    src = tmp_path / f"ivfwave{n}"
    src.mkdir(exist_ok=True)
    wave_df.select("vec_id", "embedding").write.mode("overwrite").parquet(
        str(src / "data")
    )
    schema = spark.read.parquet(str(src / "data")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "data"))
    q = start_incremental_ivf(
        spark, stream, lake,
        checkpoint=checkpoint or str(tmp_path / f"ivfckpt{n}"),
        **kw,
    )
    q.awaitTermination(120)


def _assignment(lake):
    return {
        (r.vec_id, r.cell)
        for r in lake.read("ivf_assignment").select("vec_id", "cell").collect()
    }


def test_incremental_ivf_converges_and_search_matches(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    base = emb.where("vec_id % 10 NOT IN (0, 5)")
    waves = [emb.where("vec_id % 10 = 0"), emb.where("vec_id % 10 = 5")]
    lake = Lakehouse(spark, str(tmp_path / "lake"))

    cents = _centroids(base, "embedding", "label", 64)
    base_d = bootstrap_ivf_state(lake, base, cents)
    assert base_d is not None and base_d > 0
    cents = lake.read("ivf_centroids")

    for n, w in enumerate(waves):
        _run_wave(spark, lake, tmp_path, w, n)

    # the maintained assignment equals one batch assignment of the
    # full corpus against the same (base-trained) centroids
    want = {
        (r.vec_id, r.cell)
        for r in assign_cells(emb, cents, "vec_id", "embedding", 1)
        .select("vec_id", "cell")
        .collect()
    }
    assert _assignment(lake) == want and want

    # search over the maintained state == rebuild-then-search
    q = emb.where("vec_id < 6")
    got = {
        tuple(r)
        for r in search_maintained_ivf(lake, q, k=3, nprobe=2).collect()
    }
    rebuilt = {
        tuple(r)
        for r in ivf_search(
            cents, assign_cells(emb, cents, "vec_id", "embedding", 1), q,
            k=3, nprobe=2,
        ).collect()
    }
    assert got == rebuilt and got

    # drift ledger: bootstrap row + one row per non-empty batch (each
    # wave is its own stream incarnation — distinct stream_id keeps
    # their batch_id=0 rows from colliding), all in-distribution
    # (same table, random split) -> no retrain flags
    rows = lake.read("ivf_drift_metrics").collect()
    assert len(rows) == 3 and sum(r.batch_id == -1 for r in rows) == 1
    assert len({(r.stream_id, r.batch_id) for r in rows}) == 3
    assert not any(r.retrain for r in rows)

    # source-level redelivery: re-running the last wave from a FRESH
    # checkpoint changes nothing (ids anti-join out; metrics row for
    # its batch_id is keyed, not appended)
    _run_wave(
        spark, lake, tmp_path, waves[1], 1,
        checkpoint=str(tmp_path / "ivfckpt_replay"),
    )
    assert _assignment(lake) == want
    assert lake.read("ivf_drift_metrics").count() == 3


def test_incremental_ivf_layout_prunes(spark, tmp_path):
    emb = spark.read.parquet(EMB)
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    cents = _centroids(emb, "embedding", "label", 64)
    bootstrap_ivf_state(lake, emb, cents)

    # the assignment table IS the inverted list: one directory per cell
    dirs = {
        d for d in os.listdir(lake.path("ivf_assignment"))
        if d.startswith("cell=")
    }
    assert dirs == {
        f"cell={r.cell}" for r in lake.read("ivf_centroids").collect()
    }

    # search scans prune to the probed cells: the cell equi-join
    # against the partition column plans a dynamic partition filter
    plan = (
        search_maintained_ivf(lake, emb.where("vec_id < 2"), k=3, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan


def _clustered_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )


def _cluster_rows(rnd, start_id, n, axis, dim):
    rows = []
    for i in range(n):
        v = [rnd.uniform(-0.02, 0.02) for _ in range(dim)]
        v[axis] += 1.0
        rows.append((start_id + i, axis, [float(x) for x in v]))
    return rows


def test_incremental_ivf_drift_fires_and_retrain_resets(spark, tmp_path):
    rnd = random.Random(11)
    dim, K = 16, 4
    base = _clustered_df(
        spark, [r for c in range(K) for r in _cluster_rows(rnd, 100 * c, 40, c, dim)]
    )
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    base_d = bootstrap_ivf_state(
        lake, base, _centroids(base, "embedding", "label", dim)
    )
    assert base_d is not None and 0 < base_d < 0.01

    # wave 0: in-distribution -> no flag
    in_dist = _clustered_df(
        spark,
        [r for c in range(K) for r in _cluster_rows(rnd, 1000 + 100 * c, 10, c, dim)],
    )
    _run_wave(spark, lake, tmp_path, in_dist, 0)
    # wave 1: a cluster on an axis no centroid explains -> flag fires
    drifted = _clustered_df(
        spark, _cluster_rows(rnd, 9000, 40, K + 3, dim)
    )
    _run_wave(spark, lake, tmp_path, drifted, 1)

    flags = {
        r.stream_id: r.retrain
        for r in lake.read("ivf_drift_metrics").collect()
        if r.batch_id >= 0
    }
    assert flags == {"ivfckpt0": False, "ivfckpt1": True}

    # the owner's response: retrain on the grown corpus with one more
    # centroid — the new quantizer explains the drifted cluster, so
    # the fresh baseline is back at tight-cluster distortion
    new_d = retrain_ivf(lake, k=K + 1, dim=dim)
    assert new_d is not None and new_d < 0.01
    m = lake.read("ivf_drift_metrics").collect()
    assert len(m) == 1 and m[0].batch_id == -1  # ledger reset
    assert lake.read("ivf_centroids").count() == K + 1
    n_total = base.count() + in_dist.count() + drifted.count()
    assert lake.read("ivf_assignment").count() == n_total

    # stream keeps running against the NEW quantizer: the previously
    # drifted direction is now in-distribution
    more_drift = _clustered_df(
        spark, _cluster_rows(rnd, 12000, 10, K + 3, dim)
    )
    _run_wave(spark, lake, tmp_path, more_drift, 2)
    rows = [
        r for r in lake.read("ivf_drift_metrics").collect() if r.batch_id >= 0
    ]
    assert len(rows) == 1 and rows[0].retrain is False


def test_incremental_ivf_requires_bootstrap(spark, tmp_path):
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    emb = spark.read.parquet(EMB).limit(5)
    with pytest.raises(Exception, match="not bootstrapped"):
        _run_wave(spark, lake, tmp_path, emb, 0)
        # foreachBatch surfaces the error on awaitTermination; if the
        # query object swallowed it, the state table must NOT exist
        assert not lake.exists("ivf_assignment")
