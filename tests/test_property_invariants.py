"""Property-based invariants (hypothesis) for the merge/SCD2/packing
cores — the operators whose correctness is a CONTRACT over arbitrary
inputs, not a golden value. Each property runs a Spark job per
example, so example counts are small and deterministic
(derandomize=True): these are invariant pins, not fuzzers.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


# --- upsert: parquet MERGE twin must equal a dict-model merge -------------

batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),           # key
            st.integers(min_value=0, max_value=99),          # value
            st.integers(min_value=0, max_value=9),           # updated_at
        ),
        min_size=1,
        max_size=5,
        unique_by=lambda r: r[0],                            # one row per key per batch
    ),
    min_size=1,
    max_size=4,
)


@PROP
@given(batches)
def test_upsert_guarded_matches_dict_model(spark, tmp_path_factory, seq):
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse

    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("lake")))
    model: dict[int, tuple[int, int]] = {}
    guard = "source.updated_at > target.updated_at"
    for batch in seq:
        df = spark.createDataFrame(batch, "k long, v long, updated_at long")
        lake.upsert("t", df, keys=["k"], update_condition=guard)
        for k, v, ts in batch:
            if k not in model or ts > model[k][1]:
                model[k] = (v, ts)
    got = {r["k"]: (r["v"], r["updated_at"]) for r in lake.read("t").collect()}
    assert got == model


# --- SCD2: exactly one current row per key; versions contiguous ----------

snapshots = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),           # business key
            st.sampled_from(["a", "b", "c"]),                # tracked value
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda r: r[0],
    ),
    min_size=1,
    max_size=4,
)


@PROP
@given(snapshots)
def test_scd2_history_invariants(spark, tmp_path_factory, seq):
    from ubeardw_databricks_lakehouse_spark.operators.scd2 import apply_scd2
    from ubeardw_databricks_lakehouse_spark.storage.lakehouse import Lakehouse

    lake = Lakehouse(spark, str(tmp_path_factory.mktemp("lake")))
    latest: dict[int, str] = {}
    seen: set[int] = set()
    for i, snap in enumerate(seq):
        df = spark.createDataFrame(snap, "k long, v string")
        apply_scd2(
            lake, "dim", df, ["k"], ["v"],
            effective_ts=f"2024-01-0{i + 1} 00:00:00",
        )
        for k, v in snap:
            latest[k] = v
            seen.add(k)
    rows = lake.read("dim").collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    assert set(by_key) == seen
    for k, history in by_key.items():
        current = [r for r in history if r["is_current"]]
        # exactly one current row per key, carrying the latest value
        assert len(current) == 1, (k, history)
        assert current[0]["v"] == latest[k]
        # versions are 1..n with no gaps; exactly the expired rows
        # carry an end date
        versions = sorted(r["version_number"] for r in history)
        assert versions == list(range(1, len(history) + 1)), (k, versions)
        for r in history:
            assert (r["effective_end_date"] is None) == bool(r["is_current"])


# --- pack_sequences: exact coverage + full-pack density -------------------

corpora = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),                       # shard
        st.integers(min_value=0, max_value=40),              # token count
    ),
    min_size=1,
    max_size=12,
)


@PROP
@given(corpora)
def test_pack_sequences_invariants(spark, docs):
    from ubeardw_databricks_lakehouse_spark.operators.chunking import (
        pack_sequences,
    )

    rows = [
        (i, shard, " ".join(f"t{j}" for j in range(n)))
        for i, (shard, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = pack_sequences(df, shard_col="source", context_len=16).collect()
    # coverage: each non-empty doc's slices are contiguous, start at 0,
    # and sum to its token count
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, (shard, n) in enumerate(docs):
        if n == 0:
            assert i not in by_doc
            continue
        slices = sorted(by_doc[i], key=lambda r: r["pack_id"])
        assert slices[0]["doc_slice_start"] == 0
        assert sum(r["slice_len"] for r in slices) == n
        # slices chain without gaps across consecutive packs
        acc = 0
        for r in slices:
            assert r["doc_slice_start"] == acc
            acc += r["slice_len"]
    # density: every pack but each shard's last is exactly full
    fill: dict[tuple, int] = {}
    for r in out:
        fill[(r["shard"], r["pack_id"])] = (
            fill.get((r["shard"], r["pack_id"]), 0) + r["slice_len"]
        )
    for shard in {s for s, _ in fill}:
        pids = [p for s, p in fill if s == shard]
        for p in pids:
            if p != max(pids):
                assert fill[(shard, p)] == 16, (shard, p)


def test_pack_sequences_rejects_duplicate_ids(spark):
    """The uniqueness contract is enforced distributedly: a duplicate
    (shard, id) pair fails the job instead of silently producing
    overlapping token ranges."""
    import pytest as _pytest

    from ubeardw_databricks_lakehouse_spark.operators.chunking import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, "a b c", "s"), (1, "d e", "s"), (2, "f", "s")],
        "doc_id long, text string, source string",
    )
    with _pytest.raises(Exception, match="duplicate doc_id"):
        pack_sequences(df, context_len=4).collect()
    # unique ids still pass with the guard on
    ok = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "d e", "s")],
        "doc_id long, text string, source string",
    )
    assert pack_sequences(ok, context_len=4).count() > 0


# --- export digest: equal row SETS <=> equal manifests --------------------

doc_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda r: r[0],
)


@PROP
@given(doc_sets)
def test_manifest_digest_set_semantics(spark, rows):
    """Permuting rows never changes the manifest; changing any payload
    always does (mod-2^60 collisions are astronomically unlikely at
    this size)."""
    from ubeardw_databricks_lakehouse_spark.operators.export import (
        shard_manifest,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = sorted(
        map(tuple, shard_manifest(df, "doc_id", "text", n_shards=3).collect())
    )
    permuted = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string")
    assert base == sorted(
        map(
            tuple,
            shard_manifest(permuted, "doc_id", "text", 3).collect(),
        )
    )
    tampered = spark.createDataFrame(
        [(k, t + "!") for k, t in rows], "doc_id long, text string"
    )
    assert base != sorted(
        map(
            tuple,
            shard_manifest(tampered, "doc_id", "text", 3).collect(),
        )
    )


# --- pagerank: mass conservation + positivity on arbitrary graphs --------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
    unique=True,
)


@PROP
@given(edge_lists)
def test_pagerank_mass_and_positivity(spark, edges):
    """On any symmetrized graph: every rank positive, total mass ~1
    (rounding drift bounded by nodes * 1e-6 per iteration)."""
    from ubeardw_databricks_lakehouse_spark.operators.graph import pagerank

    sym = list({(str(a), str(b)) for a, b in edges} | {
        (str(b), str(a)) for a, b in edges
    })
    df = spark.createDataFrame(sym, "src string, dst string")
    got = {r["node"]: float(r["rank"]) for r in pagerank(df, n_iter=2).collect()}
    n = len({x for e in sym for x in e})
    assert len(got) == n
    assert all(v > 0 for v in got.values())
    assert abs(sum(got.values()) - 1.0) <= n * 3e-6 + 1e-9


# --- gapfill: dense grid, observed flags, fill correctness ---------------

event_sets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),    # key
        st.integers(min_value=0, max_value=9),    # day offset
        st.integers(min_value=0, max_value=50),   # value
    ),
    min_size=1,
    max_size=15,
)


@PROP
@given(event_sets)
def test_gapfill_grid_is_dense_and_fill_is_last_observed(spark, rows):
    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        gapfill_ffill,
    )

    df = spark.createDataFrame(
        [(k, f"2024-01-{d + 1:02d} 06:00:00", float(v)) for k, d, v in rows],
        "k long, ts_s string, value double",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = gapfill_ffill(df, "k", "ts", "value", step="day").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    model: dict[int, dict[int, float]] = {}
    for k, d, v in rows:
        model.setdefault(k, {}).setdefault(d, 0.0)
        model[k][d] += v
    for k, rs in by_key.items():
        days = sorted(int(str(r["bucket"])[8:10]) - 1 for r in rs)
        # dense: every day between min and max observed, exactly once
        assert days == list(range(min(model[k]), max(model[k]) + 1))
        last = None
        for r in sorted(rs, key=lambda r: r["bucket"]):
            d = int(str(r["bucket"])[8:10]) - 1
            if d in model[k]:
                assert r["observed"] and float(r["bucket_value"]) == model[k][d]
                last = model[k][d]
            else:
                assert not r["observed"] and r["bucket_value"] is None
            assert float(r["filled_value"]) == last


# --- triangle counts: equal a brute-force reference on any graph ----------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),
        st.integers(min_value=0, max_value=11),
    ),
    min_size=0,
    max_size=30,
)


@PROP
@given(edge_lists)
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in und for n in e})
    expect: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= und:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    if not und:
        return  # createDataFrame needs rows; empty graph is covered above
    df = spark.createDataFrame(sorted(und), "src long, dst long")
    for orient in ("degree", "id"):
        got = {
            r["node"]: r["triangles"]
            for r in triangle_counts(df, orient=orient).collect()
        }
        assert got == expect, orient


# --- BFS: distances match a python BFS on random graphs ------------------


@PROP
@given(edge_lists, st.integers(min_value=1, max_value=4))
def test_bfs_hops_matches_python_bfs(spark, edges, max_hops):
    from collections import deque

    from ubeardw_databricks_lakehouse_spark.operators.graph import bfs_hops

    und = {(a, b) for a, b in edges if a != b}
    if not und:
        return  # empty graph covered by the dedicated unit test
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seed = min(adj)  # the operator's deterministic default
    expect = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if expect[u] == max_hops:
            continue
        for v in adj[u]:
            if v not in expect:
                expect[v] = expect[u] + 1
                q.append(v)
    df = spark.createDataFrame(sorted(und), "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(df, max_hops=max_hops).collect()
    }
    assert got == expect


# --- capped linkage: salting only removes; multi-pass only recovers ------

name_corpora = st.lists(
    st.text(
        alphabet="ab in",  # tiny alphabet: forces block/band collisions
        min_size=1,
        max_size=8,
    ).map(lambda s: " ".join(s.split()) or "a"),  # normalize whitespace
    min_size=2,
    max_size=14,
    unique=True,
)


@PROP
@given(name_corpora, st.integers(min_value=1, max_value=3))
def test_fuzzy_capped_between_empty_and_exact(spark, names, cap):
    """For ANY corpus and cap: capped single-pass pairs ⊆ uncapped
    exact pairs (salting may only LOSE pairs), and the 4-key capped
    multi-pass is a superset of capped single (pass 1 reuses the same
    key + deterministic salting) while every returned pair still
    verifies under the levenshtein threshold (no false positives from
    the extra keys)."""
    from ubeardw_databricks_lakehouse_spark.operators.linkage import (
        fuzzy_block_pairs,
        fuzzy_block_pairs_multi,
    )

    df = spark.createDataFrame([(n,) for n in names], ["name"])
    exact = {
        (r.name_a, r.name_b)
        for r in fuzzy_block_pairs(df, max_dist=2).collect()
    }
    single = {
        (r.name_a, r.name_b)
        for r in fuzzy_block_pairs(df, max_dist=2, block_cap=cap).collect()
    }
    multi = {
        (r.name_a, r.name_b)
        for r in fuzzy_block_pairs_multi(
            df, max_dist=2, block_cap=cap
        ).collect()
    }
    assert single <= exact
    assert single <= multi

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for a, b in multi:
        assert a < b and lev(a, b) <= 2, (a, b)


# --- sweep-line concurrency: curve equals the brute-force sweep ----------

interval_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),   # start second
        st.integers(min_value=0, max_value=15),   # duration seconds
    ),
    min_size=1,
    max_size=20,
)


@PROP
@given(interval_sets)
def test_interval_concurrency_matches_brute_force(spark, ivs):
    """On any interval set (overlaps, ties, single instants, exact
    meets): the distributed curve equals the python sweep at every
    boundary, and the value at each boundary counts exactly the
    intervals covering it (closed-interval semantics)."""
    import datetime as dt

    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        interval_concurrency,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            base + dt.timedelta(seconds=s),
            base + dt.timedelta(seconds=s + d),
        )
        for s, d in ivs
    ]
    df = spark.createDataFrame(rows, "start_ts timestamp, end_ts timestamp")
    got = {
        r["ts"]: r["concurrent"]
        for r in interval_concurrency(df).collect()
    }
    # brute force: delta map, then running sum over sorted boundaries
    deltas: dict[dt.datetime, int] = {}
    for s, e in rows:
        deltas[s] = deltas.get(s, 0) + 1
        ee = e + dt.timedelta(seconds=1)
        deltas[ee] = deltas.get(ee, 0) - 1
    acc, expect = 0, {}
    for ts in sorted(deltas):
        acc += deltas[ts]
        expect[ts] = acc
    assert got == expect
    # closed-interval reading: at each boundary the curve counts the
    # intervals whose [s, e] covers it
    for ts, c in got.items():
        assert c == sum(1 for s, e in rows if s <= ts <= e)


# --- triangle hub cap: lower bound, determinism, exact when covering -----

tri_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
    unique=True,
)


@PROP
@given(tri_edge_lists)
def test_triangle_hub_cap_properties(spark, edges):
    """On any graph: drop-mode counts are a per-node lower bound of the
    exact counts, and a cap covering every possible out-degree is a
    no-op for BOTH modes."""
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    exact = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    dropped = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=2, on_hub="drop").collect()
    }
    assert all(dropped[n] <= exact.get(n, 0) for n in dropped)
    for mode in ("drop", "estimate"):
        cov = {
            r["node"]: r["triangles"]
            for r in triangle_counts(df, hub_cap=10, on_hub=mode).collect()
        }
        assert cov == exact, mode


# --- id_half_keys: the per-substitution recovery guarantee ----------------

serial_edits = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=19),   # which base entity
        st.integers(min_value=0, max_value=5),    # edited serial digit
        st.integers(min_value=0, max_value=25),   # replacement letter
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@PROP
@given(serial_edits)
def test_id_half_keys_always_recover_single_substitutions(spark, edits):
    """For ANY single-character substitution inside a structured-ID
    token: one half of the ID is intact, so the half-key battery
    generates the candidate and the verify keeps it — provided the
    half blocks clear the cap: both halves are distinct per entity
    here, so every half block holds <= 2 rows << cap 10. (A shared
    half prefix over the cap gets salted like any hot key — that is
    the documented cap trade, not a guarantee break; the first draft
    of this generator hit exactly that with 20 serials sharing prefix
    "100".) The edit position and replacement are adversarial."""
    from ubeardw_databricks_lakehouse_spark.operators.linkage import (
        fuzzy_block_pairs_multi,
        id_half_keys,
    )

    base = [f"acme {100 + i:03d}{900 - i:03d} inc" for i in range(20)]
    names = list(base)
    planted = set()
    for ent, pos, letter in edits:
        src = base[ent]
        p = 5 + pos  # inside the 6-digit serial
        var = src[:p] + chr(ord("a") + letter) + src[p + 1 :]
        if var == src:
            continue
        names.append(var)
        planted.add(tuple(sorted((src, var))))
    if not planted:
        return
    df = spark.createDataFrame([(x,) for x in names], ["name"])
    got = {
        tuple(sorted((r.name_a, r.name_b)))
        for r in fuzzy_block_pairs_multi(
            df, max_dist=4, block_cap=10, extra_blocks=id_half_keys("name")
        ).collect()
    }
    assert planted <= got, planted - got


# --- t-digest core: conservation + monotonicity over arbitrary inputs ----

tdigest_inputs = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=400,
)


@given(tdigest_inputs)
@settings(
    max_examples=80,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
def test_tdigest_core_invariants(vals):
    """Pure-numpy core (no Spark per example): compression conserves
    total weight exactly and the weighted mean to float tolerance,
    stays within the 2*delta size bound, and quantile reads are
    monotone with exact endpoints."""
    import numpy as np

    from ubeardw_databricks_lakehouse_spark.operators.tdigest import (
        _compress,
        _quantile,
    )

    delta = 50.0
    m, w = _compress(vals, [1.0] * len(vals), delta)
    assert abs(w.sum() - len(vals)) < 1e-9  # unit weights: exact
    assert len(m) <= max(2 * delta, 1)
    assert np.all(np.diff(m) >= 0)  # centroids stay sorted
    if len(vals) > 1:
        assert abs(float((m * w).sum()) - float(np.sum(vals))) <= (
            1e-9 * max(1.0, float(np.abs(vals).sum()))
        )
    tmin, tmax, total = min(vals), max(vals), float(len(vals))
    qs = [0.0, 0.1, 0.5, 0.9, 1.0]
    est = [_quantile(m, w, tmin, tmax, total, q) for q in qs]
    assert est[0] == tmin and est[-1] == tmax
    assert all(a <= b + 1e-12 for a, b in zip(est, est[1:]))
    # every estimate stays inside the data range
    assert all(tmin - 1e-12 <= e <= tmax + 1e-12 for e in est)


# --- LPA: synchronous community labels match a python replay --------------


@PROP
@given(edge_lists, st.integers(min_value=1, max_value=3))
def test_community_lpa_matches_python_replay(spark, edges, n_iter):
    from collections import Counter

    from ubeardw_databricks_lakehouse_spark.operators.graph import community_lpa

    und = {(a, b) for a, b in edges if a != b}
    if not und:
        return  # empty graph: nothing to label
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lbl = {v: v for v in adj}
    for _ in range(n_iter):
        lbl = {
            v: max(
                Counter(lbl[w] for w in adj[v]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for v in adj
        }
    df = spark.createDataFrame(sorted(und), "src long, dst long")
    got = dict(community_lpa(df, n_iter=n_iter).collect())
    assert got == lbl


# --- radius join: celled pairs == brute force on gridded coords ----------

point_sets = st.lists(
    st.tuples(
        st.integers(min_value=-20, max_value=20),  # x eighths: boundary-rich
        st.integers(min_value=-20, max_value=20),
    ),
    min_size=2,
    max_size=25,
)


@PROP
@given(point_sets, st.sampled_from([0.5, 1.0, 2.5]))
def test_radius_join_matches_bruteforce_property(spark, grid_pts, radius):
    from itertools import combinations

    from ubeardw_databricks_lakehouse_spark.operators.spatial import radius_join

    # eighth-unit grid coords: many pairs land EXACTLY on cell edges
    # and at distance == radius, the residual-vs-candidate corners
    pts = [(i, gx / 8.0, gy / 8.0) for i, (gx, gy) in enumerate(grid_pts)]
    expect = {}
    for (i, xi, yi), (j, xj, yj) in combinations(pts, 2):
        dsq = (xi - xj) ** 2 + (yi - yj) ** 2
        if dsq <= radius * radius:
            expect[(i, j)] = dsq
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        (a, b): d for a, b, d in radius_join(df, "id", "x", "y", radius).collect()
    }
    assert got == expect
