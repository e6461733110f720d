"""Gap-fill, PageRank, and file-source (CSV/JSONL) operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ubeardw_databricks_lakehouse_spark.operators.graph import pagerank
from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
    gapfill_ffill,
)
from ubeardw_databricks_lakehouse_spark.sources.files import (
    read_csv,
    read_jsonl,
    split_corrupt,
    write_csv,
    write_jsonl,
)

# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------


def test_gapfill_fills_gaps_and_flags(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 5.0),
        (1, "2024-01-01 11:00:00", 2.0),
        (1, "2024-01-03 09:00:00", 1.0),
        (2, "2024-01-02 00:00:00", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    out = gapfill_ffill(df, "user_id", "ts", "value", step="day")
    got = {
        (r["user_id"], str(r["bucket"])[:10]): (
            r["bucket_value"],
            float(r["filled_value"]),
            r["observed"],
        )
        for r in out.collect()
    }
    # user 1: days 1..3, day 2 is a gap carrying day 1's total
    assert float(got[(1, "2024-01-01")][0]) == 7.0
    assert got[(1, "2024-01-02")][0] is None
    assert got[(1, "2024-01-02")][1] == 7.0 and not got[(1, "2024-01-02")][2]
    assert got[(1, "2024-01-03")][1] == 1.0 and got[(1, "2024-01-03")][2]
    # user 2: single-day span, no gap rows invented
    assert [k for k in got if k[0] == 2] == [(2, "2024-01-02")]


def test_gapfill_rejects_unknown_step(spark):
    df = spark.createDataFrame([(1, "2024-01-01", 1.0)], "a long, ts string, v double")
    with pytest.raises(ValueError):
        gapfill_ffill(df, "a", "ts", "v", step="fortnight")


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------


def test_pagerank_two_node_symmetry(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=5).collect()}
    # perfectly symmetric graph: both nodes hold exactly half the mass
    assert got["a"] == pytest.approx(0.5, abs=1e-6)
    assert got["b"] == pytest.approx(0.5, abs=1e-6)


def test_pagerank_star_center_dominates_and_conserves_mass(spark):
    leaves = [f"l{i}" for i in range(6)]
    edges = [("hub", l) for l in leaves] + [(l, "hub") for l in leaves]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=3).collect()}
    assert all(got["hub"] > got[l] for l in leaves)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-3)
    # leaves are symmetric -> identical ranks
    assert len({got[l] for l in leaves}) == 1


def test_pagerank_matches_reference_iteration(spark):
    """Exact replay of the rounded iteration in plain python."""
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"),
        ("a", "c"), ("c", "d"), ("d", "c"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: float(r["rank"]) for r in pagerank(e, n_iter=3).collect()}

    nodes = sorted({x for p in edges for x in p})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1

    def rnd(x):  # engine-style HALF_UP at 6 dp
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    ranks = {v: rnd(1.0 / n) for v in nodes}
    for _ in range(3):
        mass = {v: 0.0 for v in nodes}
        for s, d in edges:
            mass[d] += rnd(ranks[s] / outdeg[s])
        ranks = {
            v: rnd((1.0 - 0.85) / n + 0.85 * mass[v]) for v in nodes
        }
    for v in nodes:
        assert got[v] == pytest.approx(ranks[v], abs=1e-9), v


def test_pagerank_float_mode_mass_and_agreement(spark):
    """The exact=False production twin: double iterations, no decimal
    tax. Pins (a) rank mass ~= 1, (b) per-node agreement with the
    decimal twin within the 6-dp rounding envelope, (c) double output
    type (no decimal cast anywhere in the plan)."""
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a"),
        ("a", "c"), ("c", "d"), ("d", "c"), ("d", "e"), ("e", "d"),
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    fast = pagerank(e, n_iter=4, exact=False)
    assert dict(fast.dtypes)["rank"] == "double"
    got = {r["node"]: float(r["rank"]) for r in fast.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    slow = {
        r["node"]: float(r["rank"])
        for r in pagerank(e, n_iter=4, exact=True).collect()
    }
    # 4 iterations of 6-dp rounding drift stays under ~1e-4
    for v, r in slow.items():
        assert got[v] == pytest.approx(r, abs=1e-4), v


def test_pagerank_fast_query_top10_overlap(spark):
    """Registry-level pin: q_pagerank_trading_fast ranks the same
    nodes at the top as the DECIMAL-exact q_pagerank_trading (>=9/10
    overlap at sf0.001 — the two paths differ only in low-order
    bits)."""
    from ubeardw_databricks_lakehouse_spark.plans.relational import (
        q_pagerank_trading,
        q_pagerank_trading_fast,
    )

    sf = "/root/testdata/sf0.001"
    exact_top = [r["node"] for r in q_pagerank_trading(spark, sf).collect()][:10]
    fast_top = [r["node"] for r in q_pagerank_trading_fast(spark, sf).collect()][:10]
    assert len(set(exact_top) & set(fast_top)) >= 9


# ---------------------------------------------------------------------------
# file sources
# ---------------------------------------------------------------------------

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def test_csv_roundtrip_hostile_content(spark, tmp_path):
    rows = [
        (1, 'comma, separated, "quoted"'),
        (2, "line\nbreak inside"),
        (3, "unicode: héllo wörld ∑"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    p = str(tmp_path / "csv")
    write_csv(df, p)
    back, quarantine, parsed = split_corrupt(
        read_csv(spark, p, _SCHEMA, multi_line=True)
    )
    assert quarantine.count() == 0
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = dict(rows)
    want[4] = None  # empty string round-trips as null in Spark CSV
    assert got == want
    parsed.unpersist()


def test_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "not a number", "text": "type clash"}\n'
    )
    clean, quarantine, parsed = split_corrupt(read_jsonl(spark, str(p), _SCHEMA))
    assert clean.count() == 2
    bad = [r[0] for r in quarantine.collect()]
    assert len(bad) == 2
    assert "THIS IS NOT JSON" in bad[0] or "THIS IS NOT JSON" in bad[1]
    parsed.unpersist()


def test_jsonl_roundtrip_exact(spark, tmp_path):
    rows = [(i, f"text {i} with ünïcode and \"quotes\"") for i in range(50)]
    df = spark.createDataFrame(rows, _SCHEMA)
    p = str(tmp_path / "jsonl")
    write_jsonl(df, p)
    back, quarantine, parsed = split_corrupt(read_jsonl(spark, p, _SCHEMA))
    assert quarantine.count() == 0
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == rows
    parsed.unpersist()


def test_orc_roundtrip_exact(spark, tmp_path):
    from ubeardw_databricks_lakehouse_spark.sources.files import (
        read_orc,
        write_orc,
    )

    rows = [(i, f"orc text {i} — ünïcode") for i in range(40)]
    df = spark.createDataFrame(rows, _SCHEMA)
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p, _SCHEMA)
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == rows


def test_interpolate_linear_midpoints(spark):
    """Hand-check: days 1 and 4 observed (10, 40); days 2 and 3
    interpolate to 20 and 30 exactly."""
    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        gapfill_interpolate,
    )

    rows = [
        (1, "2024-01-01 08:00:00", 10.0),
        (1, "2024-01-04 09:00:00", 40.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, value double"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    got = {
        str(r["bucket"])[:10]: (float(r["interp_value"]), r["observed"])
        for r in gapfill_interpolate(df, "user_id", "ts", "value").collect()
    }
    assert got["2024-01-01"] == (10.0, True)
    assert got["2024-01-02"] == (20.0, False)
    assert got["2024-01-03"] == (30.0, False)
    assert got["2024-01-04"] == (40.0, True)


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def test_triangle_counts_k4_and_path(spark):
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    # K4: every node sits in C(3,2)=3 triangles; 4 triangles total
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(k4).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # a path has no triangles -> empty result
    path = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    assert triangle_counts(path).count() == 0


def test_triangle_counts_ignores_direction_dups_and_loops(spark):
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    # one triangle fed as a messy multigraph: reversed edges, repeats,
    # and a self-loop must not change the count
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (2, 2), (1, 2)],
        "src long, dst long",
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(messy).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_hub_graph_string_nodes(spark):
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    # hub h connected to 5 spokes, spokes s0-s1 and s2-s3 closed:
    # 2 triangles; h in both, each closing spoke in exactly one.
    edges = [("h", f"s{i}") for i in range(5)] + [("s0", "s1"), ("s2", "s3")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {"h": 2, "s0": 1, "s1": 1, "s2": 1, "s3": 1}


def test_triangle_counts_orientation_invariant(spark):
    """degree- and id-orientation must produce identical counts on a
    graph with hubs, chains, and overlapping triangles."""
    import random

    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    rng = random.Random(7)
    n = 40
    edges = {(a, b) for a in range(3) for b in range(n) if a < b}  # 3 hubs
    while len(edges) < 140:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    by_deg = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, orient="degree").collect()
    }
    by_id = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, orient="id").collect()
    }
    assert by_deg == by_id and sum(by_deg.values()) > 0


def test_triangle_counts_rejects_unknown_orient(spark):
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        triangle_counts(df, orient="random").count()


def test_triangle_hub_cap_exact_when_cap_covers(spark):
    """hub_cap >= max out-degree is a no-op: identical counts to the
    uncapped run on a graph with hubs and overlapping triangles (degree
    orientation bounds out-degree well below |V|, so a cap at |V| always
    covers)."""
    import random

    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    rng = random.Random(11)
    n = 30
    edges = {(a, b) for a in range(2) for b in range(n) if a < b}
    while len(edges) < 110:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    exact = {
        r["node"]: r["triangles"] for r in triangle_counts(df).collect()
    }
    capped = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=n).collect()
    }
    assert capped == exact and sum(exact.values()) > 0


def test_triangle_hub_cap_is_deterministic_lower_bound(spark):
    """On K4 with cap=2 the counts are exactly the closed wedges over
    each pivot's 2 lowest-ordered out-neighbors — a deterministic,
    reproducible lower bound, never an over-count. Under (deg, id)
    orientation K4 orients 0->{1,2,3}, 1->{2,3}, 2->{3}; capping pivot
    0 at 2 keeps wedge (1,2) only, so triangles (0,1,2) and (1,2,3)
    survive and (0,1,3)/(0,2,3) are dropped."""
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    capped = {
        r["node"]: r["triangles"]
        for r in triangle_counts(k4, hub_cap=2).collect()
    }
    assert capped == {0: 1, 1: 2, 2: 2, 3: 1}
    exact = {r["node"]: r["triangles"] for r in triangle_counts(k4).collect()}
    assert all(capped[n] <= exact[n] for n in capped)
    rerun = {
        r["node"]: r["triangles"]
        for r in triangle_counts(k4, hub_cap=2).collect()
    }
    assert rerun == capped
    with pytest.raises(ValueError):
        triangle_counts(k4, hub_cap=0)


def test_triangle_hub_estimate_mode(spark):
    """on_hub='estimate' (Horvitz-Thompson wedge sampling with
    deterministic xxhash64 neighbor order): exact when the cap covers
    every pivot, reproducible run-to-run, and within 15% of the true
    triangle TOTAL on a dense random graph where the drop mode's floor
    is off by >60% (the dense-core regime the mode exists for)."""
    import random

    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
    )

    rng = random.Random(23)
    n = 60
    edges = {
        (a, b)
        for a in range(n)
        for b in range(n)
        if a < b and rng.random() < 0.4
    }
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    exact = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    exact_total = sum(exact.values())
    est = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=8, on_hub="estimate").collect()
    }
    rerun = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=8, on_hub="estimate").collect()
    }
    assert rerun == est  # xxhash order, not rand(): reproducible
    assert abs(sum(est.values()) - exact_total) / exact_total < 0.15
    # a different seed samples a different subset (independent
    # estimate — callers average seeds for ~1/sqrt(K) error) but
    # stays in the same accuracy envelope
    other = {
        r["node"]: r["triangles"]
        for r in triangle_counts(
            df, hub_cap=8, on_hub="estimate", hub_seed=7
        ).collect()
    }
    assert other != est
    assert abs(sum(other.values()) - exact_total) / exact_total < 0.15
    dropped = {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=8, on_hub="drop").collect()
    }
    assert sum(dropped.values()) / exact_total < 0.4  # floor far off here
    # cap covering every out-degree: estimate degenerates to exact
    assert {
        r["node"]: r["triangles"]
        for r in triangle_counts(df, hub_cap=n, on_hub="estimate").collect()
    } == exact
    with pytest.raises(ValueError):
        triangle_counts(df, hub_cap=8, on_hub="salt")
    with pytest.raises(ValueError):
        triangle_counts(df, hub_cap=1, on_hub="estimate")


def test_triangle_hub_audit_arithmetic(spark):
    """The audit's wedge accounting must be internally consistent and
    match the orientation's out-degree sequence: K4 orients to
    out-degrees (3, 2, 1, 0) -> 4 wedges total; cap=2 keeps
    C(2,2)+C(2,2)+0 = 2 and drops 2 at the single capped pivot."""
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_hub_audit,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src long, dst long",
    )
    row = triangle_hub_audit(k4, hub_cap=2).collect()[0]
    assert row["wedges_total"] == 4
    assert row["wedges_kept"] == 2
    assert row["wedges_dropped"] == 2
    assert row["capped_pivots"] == 1
    assert row["total_pivots"] == 3  # node 3 has out-degree 0: no row
    assert row["wedges_kept"] + row["wedges_dropped"] == row["wedges_total"]
    # cap above max out-degree: nothing capped, nothing dropped
    row = triangle_hub_audit(k4, hub_cap=3).collect()[0]
    assert row["capped_pivots"] == 0 and row["wedges_dropped"] == 0


def test_triangle_playbook_audit_cap_estimate(spark):
    """The SCALING.md dense-core playbook as ONE flow (r9 verdict #7):
    price candidate caps with triangle_hub_audit, pick the smallest
    cap whose dropped-wedge share clears a budget, then run
    on_hub='estimate' at that cap and hold the end-to-end accuracy
    bound vs the exact count. Graph: a 30-clique dense core (where a
    naive cap's drop-floor is orders off) + a 120-node chord ring (the
    sparse background the cap must not disturb)."""
    from ubeardw_databricks_lakehouse_spark.operators.graph import (
        triangle_counts,
        triangle_hub_audit,
    )

    core = [(a, b) for a in range(30) for b in range(30) if a < b]
    ring = [
        (100 + i, 100 + (i + d) % 120) for i in range(120) for d in (1, 2)
    ]
    edges = spark.createDataFrame(
        core + [(min(a, b), max(a, b)) for a, b in ring],
        "src long, dst long",
    ).localCheckpoint(eager=True)

    exact = {
        r["node"]: r["triangles"] for r in triangle_counts(edges).collect()
    }
    exact_total = sum(exact.values()) // 3
    assert exact_total == 4060 + 120  # C(30,3) clique + one per ring node

    # step 1 — AUDIT: price the caps before paying for any wedge join
    audits = {
        cap: triangle_hub_audit(edges, hub_cap=cap).collect()[0]
        for cap in (4, 8, 16)
    }
    # the audit must show the escalation is real: drop share shrinks
    shares = {
        cap: row["wedges_dropped"] / row["wedges_total"]
        for cap, row in audits.items()
    }
    assert shares[4] > shares[8] > shares[16]
    # step 2 — CAP: smallest candidate whose dropped share <= 60%
    cap = next(c for c in (4, 8, 16) if shares[c] <= 0.6)
    assert audits[cap]["capped_pivots"] > 0  # the core IS capped
    # step 3 — ESTIMATE at the audited cap, averaging 3 seeds
    # (documented ~1/sqrt(K) variance reduction)
    totals = []
    for seed in (0, 1, 2):
        est = triangle_counts(
            edges, hub_cap=cap, on_hub="estimate", hub_seed=seed
        )
        totals.append(
            est.agg(F.sum("triangles")).collect()[0][0] // 3
        )
    mean_total = sum(totals) / len(totals)
    assert abs(mean_total - exact_total) / exact_total <= 0.15, (
        cap,
        totals,
        exact_total,
    )
    # and the playbook beats the drop-mode floor it exists to replace
    floor_total = (
        triangle_counts(edges, hub_cap=cap, on_hub="drop")
        .agg(F.sum("triangles"))
        .collect()[0][0]
        // 3
    )
    assert abs(floor_total - exact_total) > abs(mean_total - exact_total)


# ---------------------------------------------------------------------------
# interval_concurrency / global_running_sum (r9 sweep-line primitive)
# ---------------------------------------------------------------------------


def test_global_running_sum_matches_window(spark):
    """The distributed prefix sum must equal SUM() OVER (ORDER BY) on a
    frame large enough to span several range partitions, including
    negative values and a zero-total partition mix."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ubeardw_databricks_lakehouse_spark.operators.ranking import (
        global_running_sum,
    )

    df = spark.range(5000).select(
        F.col("id").alias("k"),
        (F.when(F.col("id") % 3 == 0, -2).otherwise(1)).alias("v"),
    )
    got = {
        r["k"]: r["running"]
        for r in global_running_sum(df, [F.col("k")], "v").collect()
    }
    expect = {
        r["k"]: r["e"]
        for r in df.withColumn(
            "e", F.sum("v").over(Window.orderBy("k"))
        ).collect()
    }
    assert got == expect


def test_interval_concurrency_closed_form(spark):
    """Hand-checkable sweep: three overlapping closed intervals plus a
    single-instant one. Simultaneous boundaries aggregate before the
    running sum, so ties need no ordering convention."""
    import datetime as dt

    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        interval_concurrency,
    )

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    ivs = spark.createDataFrame(
        [
            (T(0), T(10)),   # A: active 0-10
            (T(5), T(15)),   # B: active 5-15
            (T(10), T(20)),  # C: starts the second A ends -> overlap at 10
            (T(30), T(30)),  # D: single instant, still counts
        ],
        "start_ts timestamp, end_ts timestamp",
    )
    got = {
        r["ts"].second + (0 if r["ts"].minute == 0 else 60): r["concurrent"]
        for r in interval_concurrency(ivs).collect()
    }
    # boundaries: 0(+A)=1, 5(+B)=2, 10(+C)=3 then 11(-A)=2, 16(-B)=1,
    # 21(-C)=0, 30(+D)=1, 31(-D)=0  (ends are +1s exclusive)
    assert got == {0: 1, 5: 2, 10: 3, 11: 2, 16: 1, 21: 0, 30: 1, 31: 0}


def test_interval_concurrency_densify_carries_midnight_level(spark):
    """The r9 ADVICE carry-in case: 3 sessions active at 23:50 ending
    01:00 next day, no new starts. Boundary-only, day 2's first
    boundary is the 01:00:01 drop -> reported max 0 (understated);
    densified, the injected midnight row carries level 3 and the
    per-day max is exact. Day 3 (boundary-free, outside the span)
    emits nothing in either mode."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.operators.timeseries import (
        interval_concurrency,
    )

    ivs = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 23, 50, 0), dt.datetime(2024, 1, 2, 1, 0, 0)),
            (dt.datetime(2024, 1, 1, 23, 50, 0), dt.datetime(2024, 1, 2, 1, 0, 0)),
            (dt.datetime(2024, 1, 1, 23, 50, 0), dt.datetime(2024, 1, 2, 1, 0, 0)),
        ],
        "start_ts timestamp, end_ts timestamp",
    )

    def day_max(df):
        return {
            r["day"].isoformat(): r["peak"]
            for r in df.groupBy(F.to_date("ts").alias("day"))
            .agg(F.max("concurrent").alias("peak"))
            .collect()
        }

    sparse = day_max(interval_concurrency(ivs))
    dense = day_max(interval_concurrency(ivs, densify_days=True))
    # boundary-only: day 2's only boundary is the drop to 0
    assert sparse == {"2024-01-01": 3, "2024-01-02": 0}
    # densified: the midnight row prices the carried level
    assert dense == {"2024-01-01": 3, "2024-01-02": 3}
    # densify must not perturb boundary rows themselves
    base = {
        r["ts"]: r["concurrent"]
        for r in interval_concurrency(ivs).collect()
    }
    densified = {
        r["ts"]: r["concurrent"]
        for r in interval_concurrency(ivs, densify_days=True).collect()
    }
    assert all(densified[ts] == v for ts, v in base.items())
    extra = set(densified) - set(base)
    assert extra == {dt.datetime(2024, 1, 2, 0, 0, 0)}
    assert densified[dt.datetime(2024, 1, 2, 0, 0, 0)] == 3


def test_global_running_sum_rejects_non_integral(spark):
    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.operators.ranking import (
        global_running_sum,
    )

    df = spark.range(10).select("id", (F.col("id") * 0.5).alias("v"))
    with pytest.raises(TypeError, match="integral"):
        global_running_sum(df, [F.col("id")], "v")


def test_prefix_primitives_reject_column_name_collisions(spark):
    """The mapInPandas schema appends out_col and injects _pid; a
    pre-existing column of either name would mean a duplicate-name
    schema or silent clobbering — both primitives must fail loudly
    (r9 ADVICE)."""
    from pyspark.sql import functions as F

    from ubeardw_databricks_lakehouse_spark.operators.ranking import (
        global_running_sum,
        with_global_row_number,
    )

    df = spark.range(10).select(
        "id", F.lit(1).alias("v"), F.lit(0).alias("running")
    )
    with pytest.raises(ValueError, match="running"):
        global_running_sum(df, [F.col("id")], "v")
    with pytest.raises(ValueError, match="rn"):
        with_global_row_number(df.withColumnRenamed("running", "rn"),
                               [F.col("id")])
    with pytest.raises(ValueError, match="_pid"):
        global_running_sum(
            df.withColumnRenamed("running", "_pid"), [F.col("id")], "v"
        )
    # a non-default out_col sidesteps the collision
    out = global_running_sum(df, [F.col("id")], "v", out_col="run2")
    assert out.where(F.col("run2") != F.col("id") + 1).count() == 0
