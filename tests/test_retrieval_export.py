"""BM25 retrieval, IVF-PQ ANN, and export-shard manifest operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ubeardw_databricks_lakehouse_spark.operators.export import (
    assign_shard,
    export_shards,
    shard_manifest,
)
from ubeardw_databricks_lakehouse_spark.operators.ivfpq import topk_ivfpq
from ubeardw_databricks_lakehouse_spark.operators.retrieval import bm25_topk
from ubeardw_databricks_lakehouse_spark.operators.similarity import (
    topk_brute_force,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _bm25_reference(corpus: dict[int, str], terms: list[str], k1=1.2, b=0.75):
    """Plain-python BM25 for cross-checking the distributed one."""
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for t in terms:
        df_t = sum(1 for v in toks.values() if t in v)
        if df_t == 0:
            continue
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        for d, v in toks.items():
            tf = v.count(t)
            if tf == 0:
                continue
            dl = len(v)
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + round(c, 6)
    return scores


def test_bm25_matches_reference(spark):
    corpus = {
        1: "spark join hash join window",
        2: "the quick brown fox",
        3: "spark spark spark hash",
        4: "window join",
        5: "nothing relevant here at all with many extra words",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_terms_hit"], float(r["bm25"]))
        for r in bm25_topk(df, ["spark", "hash", "join", "window"], k=10).collect()
    }
    ref = _bm25_reference(corpus, ["spark", "hash", "join", "window"])
    assert set(got) == set(ref)
    for d, (_hits, score) in got.items():
        assert score == pytest.approx(ref[d], abs=2e-6), d
    # doc 2 and 5 have no query terms -> absent
    assert 2 not in got and 5 not in got


def test_bm25_ranking_properties(docs):
    out = bm25_topk(docs, ["spark", "hash"], k=15).collect()
    assert 0 < len(out) <= 15
    scores = [float(r["bm25"]) for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms_hit"] <= 2 for r in out)


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC)
# ---------------------------------------------------------------------------


def test_ivfpq_mechanism_on_corpus(spark, emb):
    """Ranks contiguous per query, self-free, neighbors in-corpus."""
    q = emb.filter(F.col("vec_id") < 4)
    rows = topk_ivfpq(emb, q, k=3, nprobe=2, m=8, ksub=8, n_iter=1).collect()
    per_q: dict[int, list[int]] = {}
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        assert r["neighbor_id"] in ids
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_ivfpq_recall_vs_brute_on_clustered(spark):
    """Recall contract: neighbors separated by MORE than the PQ
    quantization error must be recovered. Geometry: 4 coarse clusters
    (the IVF cells) × 8 sub-groups of 5 near-identical points — a
    point's exact top-4 are its sub-group peers, separated from other
    sub-groups by an offset far above the point noise. (Peers closer
    than the quantization floor — e.g. noise-level orderings inside
    one tight blob — are explicitly NOT promised by ADC scanning.)"""
    import random

    rnd = random.Random(11)
    rows = []
    i = 0
    for c in range(4):
        center = [2.0 if d % 4 == c else 0.0 for d in range(16)]
        for g in range(8):
            off = [0.0] * 16
            off[(4 * c + g) % 16] += 0.9
            off[(4 * c + g + 7) % 16] -= 0.9
            for _ in range(5):
                vec = [
                    center[d] + off[d] + rnd.uniform(-0.02, 0.02)
                    for d in range(16)
                ]
                rows.append((i, vec, c))
                i += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    q = df.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_brute_force(df, q, k=4).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_ivfpq(
            df, q, dim=16, k=4, nprobe=2, m=4, ksub=16, n_iter=2
        ).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, recall


# ---------------------------------------------------------------------------
# Export shards + manifest
# ---------------------------------------------------------------------------


def test_manifest_is_row_order_insensitive(docs):
    m1 = shard_manifest(docs, "doc_id", "text", n_shards=8).collect()
    shuffled = docs.orderBy(F.reverse(F.col("text"))).repartition(7)
    m2 = shard_manifest(shuffled, "doc_id", "text", n_shards=8).collect()
    assert sorted(map(tuple, m1)) == sorted(map(tuple, m2))
    assert sum(r["n_rows"] for r in m1) == docs.count()


def test_manifest_detects_any_row_change(spark, docs):
    base = shard_manifest(docs, "doc_id", "text", n_shards=4).collect()
    tampered = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit(" x")))
        .otherwise(F.col("text")),
    )
    after = shard_manifest(tampered, "doc_id", "text", n_shards=4).collect()
    diffs = set(map(tuple, base)) ^ set(map(tuple, after))
    # exactly the one shard holding doc 7 differs, and only in digest/chars
    assert len(diffs) == 2
    changed_shards = {d[0] for d in diffs}
    assert len(changed_shards) == 1


def test_export_writes_partitioned_shards(spark, docs, tmp_path):
    out = str(tmp_path / "export")
    manifest = export_shards(docs, out, "doc_id", "text", n_shards=4).collect()
    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    # loader-side verification: re-read one shard, recount
    for r in manifest:
        got = spark.read.parquet(f"{out}/shard={r['shard']}").count()
        assert got == r["n_rows"]
    # shard assignment matches the manifest's accounting
    total = sum(r["n_rows"] for r in manifest)
    assert total == docs.count()
    back = spark.read.parquet(out)
    sh = assign_shard(docs, "doc_id", 4)
    assert (
        back.groupBy("shard").count().orderBy("shard").collect()
        == sh.groupBy("shard").count().orderBy("shard").collect()
    )


def test_export_manifest_describes_disk_not_plan(spark, docs, tmp_path):
    """The returned manifest is computed from the written parquet, so
    a NONDETERMINISTIC upstream (unseeded rand filter — each evaluation
    keeps a different row set) still yields a manifest that agrees
    exactly with what a loader reads back from disk."""
    from ubeardw_databricks_lakehouse_spark.operators.export import (
        _manifest_agg,
    )

    flaky = docs.filter(F.rand() < 0.5)  # no seed: re-eval != first eval
    out = str(tmp_path / "flaky_export")
    manifest = sorted(
        map(tuple, export_shards(flaky, out, "doc_id", "text", n_shards=4).collect())
    )
    on_disk = sorted(
        map(
            tuple,
            _manifest_agg(spark.read.parquet(out), "doc_id", "text").collect(),
        )
    )
    assert manifest == on_disk
    n_written = spark.read.parquet(out).count()
    assert sum(r[1] for r in manifest) == n_written


def test_export_empty_input_yields_empty_manifest(spark, tmp_path):
    """Regression (r5 advice): an EMPTY input writes no part files, so
    the disk read-back must use the writer's explicit schema instead of
    inference — the manifest is empty, not an AnalysisException."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    empty = spark.createDataFrame([], schema)
    out = str(tmp_path / "empty_export")
    manifest = export_shards(empty, out, "doc_id", "text", n_shards=4).collect()
    assert manifest == []


def test_incremental_neardup_subset_and_delta_touching(spark):
    """The incremental batch output must be exactly the delta-touching
    slice of the full-recompute pair set (signature reuse changes
    nothing about the pairs themselves)."""
    from ubeardw_databricks_lakehouse_spark.operators.dedup import (
        neardup_verified_pairs,
    )
    from ubeardw_databricks_lakehouse_spark.operators.sampling import (
        hash_bucket,
    )
    from ubeardw_databricks_lakehouse_spark.plans.llm_q import (
        q_incremental_neardup,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    full = {
        (r["id_a"], r["id_b"])
        for r in neardup_verified_pairs(
            docs, n_hashes=8, band_size=2, threshold=0.5
        ).collect()
    }
    delta_ids = {
        r["doc_id"]
        for r in docs.filter(hash_bucket("doc_id", "inc1") >= 9000)
        .select("doc_id")
        .collect()
    }
    inc = {
        (r["id_a"], r["id_b"])
        for r in q_incremental_neardup(spark, sf).collect()
    }
    want = {p for p in full if p[0] in delta_ids or p[1] in delta_ids}
    assert inc == want


def test_manifest_digest_null_payload_matches_oracle_semantics(spark):
    """Regression (review finding): a null payload must hash as
    'key|' on BOTH engines — concat_ws would silently skip the null
    and diverge from the SQL oracle's COALESCE(text, '')."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {
        r["shard"]: (r["n_rows"], r["content_digest"])
        for r in shard_manifest(df, "doc_id", "text", n_shards=1).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES (1, 'a'), (2, NULL), (3, '')) t(doc_id, text)")
    want = con.execute(
        """
        SELECT CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|'
            || COALESCE(text, '')), 1, 15)) AS BIGINT))
            % 1152921504606846976 AS BIGINT)
        FROM d
        """
    ).fetchone()
    assert got[0] == (want[0], want[1])


def test_export_shuffle_order_deterministic(spark, docs, tmp_path):
    """shuffle_seed pins within-shard row order: two exports with the
    same seed are row-for-row identical; a different seed permutes the
    order but not the membership."""
    from pyspark.sql import functions as _F

    def order_of(out):
        export_shards(
            docs, out, "doc_id", "text", n_shards=2, shuffle_seed=s
        )
        return {
            sh: [
                r["doc_id"]
                for r in spark.read.parquet(f"{out}/shard={sh}").collect()
            ]
            for sh in (0, 1)
        }

    s = "epoch1"
    o1 = order_of(str(tmp_path / "a"))
    o2 = order_of(str(tmp_path / "b"))
    assert o1 == o2  # same seed -> identical order
    # order actually follows the hash, not input order
    for sh, ids in o1.items():
        want = sorted(
            ids,
            key=lambda i: spark.sql(
                f"SELECT xxhash64('epoch1', CAST({i} AS STRING))"
            ).first()[0],
        )
        assert ids == want
    s = "epoch2"
    o3 = order_of(str(tmp_path / "c"))
    assert {k: sorted(v) for k, v in o1.items()} == {
        k: sorted(v) for k, v in o3.items()
    }  # membership unchanged
    assert o1 != o3  # order changed


def test_hard_negatives_label_mismatch_and_ranks(spark, emb):
    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        hard_negatives,
    )

    q = emb.filter(F.col("vec_id") < 4)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = hard_negatives(emb, q, k=3).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        assert labels[r["neighbor_id"]] != labels[r["query_id"]]
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_bm25_index_path_equals_direct(spark, docs):
    """The materialized tf-index path must reproduce the direct-scan
    BM25 exactly (same tokenization, same stats) — the index-reuse
    contract, like signatures= for near-dup."""
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import (
        build_tf_index,
    )

    terms = ["spark", "hash", "join"]
    direct = sorted(
        map(tuple, bm25_topk(docs, terms, k=15).collect())
    )
    idx = build_tf_index(docs).localCheckpoint(eager=True)
    via_index = sorted(
        map(tuple, bm25_topk(docs, terms, k=15, tf_index=idx).collect())
    )
    assert direct == via_index


def test_bm25_index_equals_direct_with_empty_docs(spark):
    """Zero-token docs count toward N/avgdl. A corpus containing empty
    and whitespace-only documents must yield identical rankings from
    the direct scan and the materialized index (explode_outer carries
    the empty docs into the index as NULL-term length rows)."""
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import (
        build_tf_index,
    )

    rows = [
        (1, "spark join hash join window"),
        (2, ""),
        (3, "   \t  "),
        (4, "hash window spark spark"),
        (5, "join window"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    terms = ["spark", "window"]
    direct = sorted(map(tuple, bm25_topk(docs, terms, k=10).collect()))
    idx = build_tf_index(docs).localCheckpoint(eager=True)
    via_index = sorted(
        map(tuple, bm25_topk(docs, terms, k=10, tf_index=idx).collect())
    )
    assert direct == via_index
    # the index must carry ALL five docs' lengths, not just token-bearing ones
    assert idx.select("doc_id").distinct().count() == 5


def test_ivfpq_prebuilt_index_reuse(spark, emb):
    """A prebuilt index serves multiple query batches and reproduces
    the one-shot path exactly (same centroids/codebook/codes)."""
    from ubeardw_databricks_lakehouse_spark.operators.ivfpq import (
        ivfpq_build,
        ivfpq_search,
    )

    index = ivfpq_build(emb, m=8, ksub=8, n_iter=1)
    q1 = emb.filter(F.col("vec_id") < 3)
    q2 = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6))
    oneshot = sorted(
        map(
            tuple,
            topk_ivfpq(emb, q1, k=3, nprobe=2, m=8, ksub=8, n_iter=1).collect(),
        )
    )
    via_index = sorted(
        map(tuple, ivfpq_search(index, q1, k=3, nprobe=2, m=8).collect())
    )
    assert oneshot == via_index
    # second batch against the SAME index works and is self-consistent
    r2 = ivfpq_search(index, q2, k=3, nprobe=2, m=8).collect()
    assert {r["query_id"] for r in r2} == {3, 4, 5}


def test_ivfpq_search_query_matches_oneshot_and_caches(spark):
    """Registry-level pin: q_embedding_topk_ivfpq_search (prebuilt,
    cached per session+sf) returns exactly the one-shot
    q_embedding_topk_ivfpq rows, and the second call reuses the cached
    index object."""
    from ubeardw_databricks_lakehouse_spark.plans import llm_q

    sf = "/root/testdata/sf0.001"
    oneshot = sorted(
        map(tuple, llm_q.q_embedding_topk_ivfpq(spark, sf).collect())
    )
    first = sorted(
        map(tuple, llm_q.q_embedding_topk_ivfpq_search(spark, sf).collect())
    )
    assert oneshot == first
    key = (spark.sparkContext.applicationId, sf)
    cached = llm_q._IVFPQ_INDEX_CACHE[key]
    second = sorted(
        map(tuple, llm_q.q_embedding_topk_ivfpq_search(spark, sf).collect())
    )
    assert second == first
    assert llm_q._IVFPQ_INDEX_CACHE[key] is cached


# ---------------------------------------------------------------------------
# RRF hybrid fusion + MMR re-rank
# ---------------------------------------------------------------------------


def test_rrf_fuse_hand_case(spark):
    """Hand-checkable fusion: doc 1 in both lists (ranks 1,2), docs 2/3
    in one list each at equal rank -> doc 1 first, then the id
    tie-break between equal singleton scores."""
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (3, 2)], "doc_id long, rank_lex int")
    vec = spark.createDataFrame([(1, 2), (2, 2)], "doc_id long, rank_vec int")
    out = rrf_fuse([lex, vec], rank_cols=["rank_lex", "rank_vec"], k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["fused_rank"] == 1
    assert abs(rows[1]["rrf"] - (1 / 61 + 1 / 62)) < 1e-15
    # docs 2 and 3 both score 1/62 -> doc_id tie-break
    assert rows[2]["fused_rank"] == 2 and rows[3]["fused_rank"] == 3
    assert rows[3]["rank_vec"] is None and rows[2]["rank_lex"] is None


def test_mmr_rerank_matches_numpy_replay(spark, emb):
    """Pin the distributed-recall + driver-greedy MMR against a fully
    independent numpy replay over the raw parquet."""
    import numpy as np

    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        mmr_rerank,
    )

    k, pool, lam = 10, 50, 0.7
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") == 0), k=k, pool=pool, lam=lam
    ).collect()
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["mmr_rank"])]

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[ids == 0][0]
    sims = mat @ q
    order = sorted(
        [i for i in range(len(ids)) if ids[i] != 0],
        key=lambda i: (-sims[i], ids[i]),
    )[:pool]
    cand_ids = ids[order]
    cand = mat[order]
    rel = cand @ q
    inter = cand @ cand.T
    sel: list[int] = []
    rem = list(range(len(cand_ids)))
    while rem and len(sel) < k:
        red = (
            inter[np.ix_(rem, sel)].max(axis=1)
            if sel
            else np.zeros(len(rem))
        )
        sc = lam * rel[rem] - (1 - lam) * red
        best = min(range(len(rem)), key=lambda i: (-sc[i], cand_ids[rem[i]]))
        sel.append(rem.pop(best))
    want = [int(cand_ids[i]) for i in sel]
    assert got == want


def test_mmr_diversity_actually_bites(spark, emb):
    """lam=1 degenerates to pure relevance (same order as top-k);
    lam<1 must deviate once redundancy exists, and never repeat docs."""
    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        mmr_rerank,
    )

    q = emb.filter(F.col("vec_id") == 0)
    pure = mmr_rerank(emb, q, k=10, pool=50, lam=1.0).collect()
    topk = topk_brute_force(emb, q, k=10).collect()
    assert [r["doc_id"] for r in sorted(pure, key=lambda r: r["mmr_rank"])] \
        == [r["neighbor_id"] for r in sorted(topk, key=lambda r: r["rank"])]
    div = mmr_rerank(emb, q, k=10, pool=50, lam=0.3).collect()
    picks = [r["doc_id"] for r in div]
    assert len(picks) == len(set(picks)) == 10


def test_bigram_lm_hand_case(spark):
    """Corpus small enough to check a conditional by hand: bigram
    'a b' appears twice, context 'a' has 3 successors, and V=4 (the
    single-token doc's 'x' still counts toward the vocabulary)
    -> p(b|a) = (2+1)/(3+4) = 3/7."""
    import math

    from ubeardw_databricks_lakehouse_spark.operators.curation import (
        bigram_logprob_score,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob_score(docs).collect()}
    assert 4 not in out  # single-token doc has no bigram positions
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["bits_per_bigram"] - (-math.log2(3 / 7))) < 1e-6
    # p(c|a) = (1+1)/(3+4) = 2/7
    assert abs(out[3]["bits_per_bigram"] - (-math.log2(2 / 7))) < 1e-6


# ---------------------------------------------------------------------------
# Incremental ANN maintenance (r13): ivf_upsert / ivfpq_upsert
# ---------------------------------------------------------------------------


def test_ivf_upsert_equals_rebuild_and_search_matches(spark, emb):
    """The maintained IVF state (base assignment UNION the upsert's
    delta assignment) is pointwise-identical to re-assigning the grown
    corpus against the same centroids, and search over it equals
    rebuild-then-search exactly."""
    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        _centroids,
        assign_cells,
        ivf_search,
        ivf_upsert,
    )

    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    cents = _centroids(base, "embedding", "label", 64).localCheckpoint(eager=True)
    base_cells = assign_cells(base, cents, "vec_id", "embedding", 1)
    delta_cells, info = ivf_upsert(cents, delta)
    assert info == {}  # no baseline handed in -> zero metric jobs
    maintained = {
        (r.vec_id, r.cell)
        for r in base_cells.unionByName(delta_cells).select("vec_id", "cell").collect()
    }
    rebuilt = {
        (r.vec_id, r.cell)
        for r in assign_cells(emb, cents, "vec_id", "embedding", 1)
        .select("vec_id", "cell")
        .collect()
    }
    assert maintained == rebuilt and maintained

    q = emb.filter(F.col("vec_id") < 6)
    got = {
        tuple(r)
        for r in ivf_search(
            cents, base_cells.unionByName(delta_cells), q, k=3, nprobe=2
        ).collect()
    }
    want = {
        tuple(r)
        for r in ivf_search(
            cents, assign_cells(emb, cents, "vec_id", "embedding", 1), q,
            k=3, nprobe=2,
        ).collect()
    }
    assert got == want and got


def test_ivf_upsert_drift_guard(spark):
    """In-distribution delta: no retrain. A delta from an unseen
    cluster direction: distortion blows past the baseline and retrain
    fires. Clustered geometry on purpose — the guard compares against
    the TRAINED quantizer's residual, which is only meaningful when
    the quantizer actually explains the training data (on uniform
    random vectors base distortion is already near the cosine ceiling
    and no drift is detectable by any ratio)."""
    import random

    from ubeardw_databricks_lakehouse_spark.operators.similarity import (
        _centroids,
        assign_cells,
        ivf_distortion,
        ivf_upsert,
    )

    rnd = random.Random(7)
    dim, K = 16, 4

    def cluster_rows(start_id, n, axis):
        rows = []
        for i in range(n):
            v = [rnd.uniform(-0.02, 0.02) for _ in range(dim)]
            v[axis] += 1.0
            rows.append((start_id + i, axis, [float(x) for x in v]))
        return rows

    base_rows = []
    for c in range(K):
        base_rows += cluster_rows(100 * c, 40, c)
    base = spark.createDataFrame(
        base_rows, "vec_id long, label long, embedding array<float>"
    )
    cents = _centroids(base, "embedding", "label", dim).localCheckpoint(eager=True)
    base_d = ivf_distortion(
        cents, assign_cells(base, cents, "vec_id", "embedding", 1)
    )
    assert base_d is not None and 0 < base_d < 0.01  # tight clusters

    # in-distribution delta (same cluster axes, new ids): no retrain
    in_dist = spark.createDataFrame(
        [r for c in range(K) for r in cluster_rows(1000 + 100 * c, 10, c)],
        "vec_id long, label long, embedding array<float>",
    )
    _cells, info = ivf_upsert(cents, in_dist, base_distortion=base_d)
    assert info["retrain"] is False
    assert info["delta_distortion"] < 1.5 * base_d

    # drifted ingest: a cluster on an axis no centroid explains
    drifted = spark.createDataFrame(
        cluster_rows(9000, 40, K + 3),
        "vec_id long, label long, embedding array<float>",
    )
    _cells2, info2 = ivf_upsert(cents, drifted, base_distortion=base_d)
    assert info2["retrain"] is True
    assert info2["delta_distortion"] > 1.5 * base_d


def test_ivfpq_upsert_codes_equal_reencode(spark, emb):
    """Delta codes from ivfpq_upsert + the build's base codes equal
    re-encoding the grown corpus with the same quantizers, and the
    ADC search over the maintained codes table is well-formed."""
    from ubeardw_databricks_lakehouse_spark.operators.ivfpq import (
        ivfpq_build,
        ivfpq_search,
        ivfpq_upsert,
    )

    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    cents, codebook, codes = ivfpq_build(base, m=8, ksub=8, n_iter=1)
    codes = codes.localCheckpoint(eager=True)
    delta_codes = ivfpq_upsert((cents, codebook, codes), delta, m=8)
    maintained = {
        tuple(r) for r in codes.unionByName(delta_codes).collect()
    }
    reencoded = {
        tuple(r)
        for r in ivfpq_upsert((cents, codebook, codes), emb, m=8).collect()
    }
    assert maintained == reencoded and maintained

    q = emb.filter(F.col("vec_id") < 4)
    rows = ivfpq_search(
        (cents, codebook, codes.unionByName(delta_codes)), q, k=3, nprobe=2, m=8
    ).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3}
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


# ---------------------------------------------------------------------------
# Incremental BM25 maintenance (r13): bm25_upsert + doc_stats path
# ---------------------------------------------------------------------------


def test_bm25_upsert_equals_rebuild(spark, docs):
    """Maintained state (base index UNION upsert delta; base doclens
    UNION delta doclens) is row-identical to rebuilding over the grown
    corpus, and BM25 over it equals rebuild-then-search exactly."""
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import (
        bm25_upsert,
        build_tf_index,
        doc_length_stats,
    )

    base = docs.where("doc_id % 10 != 0")
    delta = docs.where("doc_id % 10 = 0")
    base_idx = build_tf_index(base).localCheckpoint(eager=True)
    base_dl = doc_length_stats(base).localCheckpoint(eager=True)
    d_idx, d_dl = bm25_upsert(delta)

    idx = base_idx.unionByName(d_idx)
    dls = base_dl.unionByName(d_dl)
    rebuilt_idx = build_tf_index(docs)
    assert sorted(map(tuple, idx.collect())) == sorted(
        map(tuple, rebuilt_idx.collect())
    )
    assert sorted(map(tuple, dls.collect())) == sorted(
        map(tuple, doc_length_stats(docs).collect())
    )

    terms = ["spark", "hash", "join"]
    maintained = sorted(
        map(
            tuple,
            bm25_topk(docs, terms, k=15, tf_index=idx, doc_stats=dls).collect(),
        )
    )
    direct = sorted(map(tuple, bm25_topk(docs, terms, k=15).collect()))
    assert maintained == direct and maintained


def test_bm25_doc_stats_path_drops_index_distinct(spark, docs):
    """With doc_stats supplied, the per-query plan aggregates the slim
    (id, dl) table — no HashAggregate-distinct over the fat tf index
    (the O(index-rows) term a maintained index must not pay per
    query). Pinned on the scan columns: the index is only ever read
    term-filtered."""
    from ubeardw_databricks_lakehouse_spark.operators.retrieval import (
        build_tf_index,
        doc_length_stats,
    )

    idx = build_tf_index(docs).localCheckpoint(eager=True)
    dls = doc_length_stats(docs).localCheckpoint(eager=True)
    with_stats = bm25_topk(
        docs, ["spark", "hash"], k=5, tf_index=idx, doc_stats=dls
    )
    plan = with_stats._jdf.queryExecution().optimizedPlan().toString()
    # the legacy path's dl derivation is a Deduplicate/Aggregate over
    # (id, dl) projected from the index; with doc_stats it must be gone
    assert "Deduplicate" not in plan
    # and the results still match the legacy index path
    legacy = bm25_topk(docs, ["spark", "hash"], k=5, tf_index=idx)
    assert sorted(map(tuple, with_stats.collect())) == sorted(
        map(tuple, legacy.collect())
    )
