"""Streaming incremental near-dup: waves of documents feeding the LSH
band index via foreachBatch must converge to the exact batch answer,
and redelivery (fresh checkpoint, mid-batch crash replay) must be
idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.operators.dedup import (
    lsh_band_index,
    minhash_signatures,
    neardup_verified_pairs,
)
from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse
from ubeardw_databricks_lakehouse_spark.streaming.incremental_neardup import (
    start_incremental_neardup,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _run_wave(spark, lake, tmp_path, wave_df, n, checkpoint=None):
    src = tmp_path / f"wave{n}"
    src.mkdir(exist_ok=True)
    wave_df.select("doc_id", "text").write.mode("overwrite").parquet(
        str(src / "data")
    )
    schema = spark.read.parquet(str(src / "data")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "data"))
    q = start_incremental_neardup(
        spark, stream, lake,
        checkpoint=checkpoint or str(tmp_path / f"ckpt{n}"),
    )
    q.awaitTermination(120)


def _pairs(lake):
    return {
        tuple(r) for r in lake.read("neardup_pairs").collect()
    } if lake.exists("neardup_pairs") else set()


def test_incremental_neardup_converges_to_batch(spark, tmp_path):
    docs = spark.read.parquet(DOCS)
    waves = [
        docs.where("doc_id % 10 NOT IN (0, 5)"),  # bootstrap corpus
        docs.where("doc_id % 10 = 0"),
        docs.where("doc_id % 10 = 5"),
    ]
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    for n, w in enumerate(waves):
        _run_wave(spark, lake, tmp_path, w, n)

    # every pair is discovered by whichever member arrives LAST, so the
    # converged pair table equals the full batch pipeline's output
    want = {tuple(r) for r in neardup_verified_pairs(docs, threshold=0.5).collect()}
    assert _pairs(lake) == want and want
    # the maintained index equals the batch-built one, corpus complete
    got_idx = {tuple(r) for r in lake.read("neardup_band_index").collect()}
    full_idx = {
        tuple(r)
        for r in lsh_band_index(minhash_signatures(docs, n_hashes=8, shingle_n=2)).collect()
    }
    assert got_idx == full_idx
    assert lake.read("neardup_corpus").count() == docs.count()

    # source-level redelivery: re-running the last wave from a FRESH
    # checkpoint changes nothing (ids already in the corpus anti-join out)
    _run_wave(spark, lake, tmp_path, waves[2], 2, checkpoint=str(tmp_path / "ckpt_replay"))
    assert _pairs(lake) == want
    assert {tuple(r) for r in lake.read("neardup_band_index").collect()} == full_idx


def test_incremental_neardup_mid_batch_crash_replay(spark, tmp_path):
    # simulate a crash BETWEEN the index merge and the corpus merge:
    # the replayed batch finds its own bands already in the index —
    # the id-inequality guard + keyed MERGEs must keep the final state
    # exactly the no-crash state (no self-pairs, no duplicates)
    docs = spark.read.parquet(DOCS)
    base = docs.where("doc_id % 10 != 0")
    wave = docs.where("doc_id % 10 = 0")
    lake = Lakehouse(spark, str(tmp_path / "lake"))
    _run_wave(spark, lake, tmp_path, base, 0)
    state_pairs = _pairs(lake)

    # crash simulation: the wave's band rows land in the index, but the
    # corpus/pairs writes are lost
    wave_bands = lsh_band_index(minhash_signatures(wave, n_hashes=8, shingle_n=2))
    lake.upsert("neardup_band_index", wave_bands, keys=["doc_id", "band_idx"])

    _run_wave(spark, lake, tmp_path, wave, 1)
    got = _pairs(lake)
    assert not any(a == b for a, b, *_ in got), "self-pair leaked on replay"
    want = {
        tuple(r)
        for r in neardup_verified_pairs(docs, threshold=0.5)
        .where("id_a % 10 = 0 OR id_b % 10 = 0")
        .collect()
    }
    assert got == state_pairs | want
    full_idx = {
        tuple(r)
        for r in lsh_band_index(minhash_signatures(docs, n_hashes=8, shingle_n=2)).collect()
    }
    assert {tuple(r) for r in lake.read("neardup_band_index").collect()} == full_idx
    assert lake.read("neardup_corpus").count() == docs.count()
