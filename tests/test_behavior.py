"""Tests for operators/behavior.py: ordered funnels, retention cohorts,
triangle counting — handcrafted cases, randomized differentials against
brute-force Python, and plan-shape asserts (the funnel must be ONE
Exchange no matter how many stages)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import Row, functions as F

from query_engine_spark.operators.behavior import (
    funnel,
    pagerank,
    retention_cohorts,
    triangle_count,
)


# ---------------------------------------------------------------------------
# funnel


@pytest.fixture()
def funnel_events(spark):
    return spark.createDataFrame(
        [
            # u1 completes all 3 in order
            Row(user_id=1, ts_us=100, event_type="view", event_id=1),
            Row(user_id=1, ts_us=200, event_type="click", event_id=2),
            Row(user_id=1, ts_us=300, event_type="purchase", event_id=3),
            # u2: click BEFORE view — click must not count; later click does
            Row(user_id=2, ts_us=100, event_type="click", event_id=4),
            Row(user_id=2, ts_us=200, event_type="view", event_id=5),
            Row(user_id=2, ts_us=350, event_type="click", event_id=6),
            # u3: purchase before click — stage 3 never validly reached
            Row(user_id=3, ts_us=100, event_type="view", event_id=7),
            Row(user_id=3, ts_us=150, event_type="purchase", event_id=8),
            Row(user_id=3, ts_us=200, event_type="click", event_id=9),
            # u4: never views -> excluded entirely
            Row(user_id=4, ts_us=100, event_type="click", event_id=10),
            # u5: tie — click at the SAME ts as view, higher event_id: counts
            Row(user_id=5, ts_us=100, event_type="view", event_id=11),
            Row(user_id=5, ts_us=100, event_type="click", event_id=12),
            # u6: tie with LOWER event_id: does not count
            Row(user_id=6, ts_us=100, event_type="click", event_id=13),
            Row(user_id=6, ts_us=100, event_type="view", event_id=14),
        ]
    )


def test_funnel_ordering_semantics(spark, funnel_events):
    out = funnel(funnel_events, ["view", "click", "purchase"])
    rows = {r.user_id: (r.t0, r.t1, r.t2) for r in out.collect()}
    assert rows[1] == (100, 200, 300)
    assert rows[2] == (200, 350, None)  # early click skipped
    assert rows[3] == (100, 200, None)  # purchase-before-click invalid
    assert 4 not in rows  # never entered the funnel
    assert rows[5] == (100, 100, None)  # tie counts (event_id after)
    assert rows[6] == (100, None, None)  # tie does not count (event_id before)


def test_funnel_single_exchange(spark, funnel_events):
    out = funnel(funnel_events, ["view", "click", "purchase"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    # k windows + the final groupBy all share one hash partition on user
    assert final.count("Exchange") == 1, plan


def brute_funnel(events, stages):
    """Reference implementation: per-user event scan in (ts, id) order."""
    by_user: dict = {}
    for e in events:
        by_user.setdefault(e[0], []).append(e)
    want = {}
    for u, evs in by_user.items():
        evs.sort(key=lambda e: (e[1], e[3]))
        times = [None] * len(stages)
        for _, ts, typ, _eid in evs:
            for i, s in enumerate(stages):
                if typ == s and times[i] is None and (i == 0 or times[i - 1] is not None):
                    times[i] = ts
                    break
        if times[0] is not None:
            want[u] = tuple(times)
    return want


def test_funnel_matches_bruteforce(spark):
    rng = random.Random(7)
    stages = ["a", "b", "c", "d"]
    events = [
        (
            rng.randrange(20),  # user
            rng.randrange(50),  # ts (dense -> plenty of ties)
            rng.choice(stages + ["x"]),
            i,  # unique event_id
        )
        for i in range(600)
    ]
    df = spark.createDataFrame(events, "user_id long, ts_us long, event_type string, event_id long")
    got = {
        r.user_id: (r.t0, r.t1, r.t2, r.t3)
        for r in funnel(df, stages).collect()
    }
    assert got == brute_funnel(events, stages)


# ---------------------------------------------------------------------------
# retention cohorts


def test_retention_grid(spark):
    df = spark.createDataFrame(
        [
            # u1 first at bucket 0, active 0 and 2; u2 first at 1, active 1, 2, 3
            Row(user_id=1, ts_us=5), Row(user_id=1, ts_us=25),
            Row(user_id=2, ts_us=12), Row(user_id=2, ts_us=22),
            Row(user_id=2, ts_us=23),  # same bucket as 22: deduped
            Row(user_id=2, ts_us=33),
        ]
    )
    out = retention_cohorts(df, bucket_us=10)
    got = {(r.cohort_bucket, r.offset): r.n_users for r in out.collect()}
    assert got == {
        (0, 0): 1, (0, 2): 1,  # u1
        (10, 0): 1, (10, 1): 1, (10, 2): 1,  # u2
    }


def test_retention_negative_ts_floor(spark):
    # floor semantics: ts=-5 at bucket width 10 is bucket -1, not 0
    df = spark.createDataFrame([Row(user_id=1, ts_us=-5), Row(user_id=1, ts_us=5)])
    out = retention_cohorts(df, bucket_us=10)
    got = {(r.cohort_bucket, r.offset): r.n_users for r in out.collect()}
    assert got == {(-10, 0): 1, (-10, 1): 1}


# ---------------------------------------------------------------------------
# triangle count


def brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    count: dict = {}
    for a, b, c in itertools.combinations(nodes, 3):
        if ((a, b) in und) and ((b, c) in und) and ((a, c) in und):
            for n in (a, b, c):
                count[n] = count.get(n, 0) + 1
    return count


def test_triangle_handcrafted(spark):
    # one triangle (1,2,3) + a dangling edge + a duplicate + a reversed dup
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (1, 2), (5, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_matches_bruteforce(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    assert got == brute_triangles(edges)


# ---------------------------------------------------------------------------
# pagerank


def brute_pagerank(edges, iters, scale=10**12):
    """Same integer fixed-point iteration in plain Python."""
    e = sorted({(u, v) for u, v in edges})
    nodes = sorted({n for uv in e for n in uv})
    n = len(nodes)
    out = {}
    for u, _ in e:
        out[u] = out.get(u, 0) + 1
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        inm = {v: 0 for v in nodes}
        for u, v in e:
            inm[v] += r[u] // out[u]
        dang = sum(r[u] for u in nodes if u not in out)
        r = {
            v: (15 * scale) // (100 * n) + (85 * (inm[v] + dang // n)) // 100
            for v in nodes
        }
    return r


def test_pagerank_matches_bruteforce_with_dangling(spark):
    rng = random.Random(3)
    # node 99 is a guaranteed sink (dangling); plus a random digraph
    edges = [(rng.randrange(20), rng.randrange(20)) for _ in range(80)]
    edges = [(u, v) for u, v in edges] + [(1, 99), (2, 99)]
    edges = [(u, v) for u, v in edges if u != 99]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(df, iters=4).collect()}
    assert got == brute_pagerank(edges, iters=4)


def test_pagerank_ranking_and_mass(spark):
    # star graph: everyone points at 0 -> node 0 must dominate
    edges = [(i, 0) for i in range(1, 11)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_q for r in pagerank(df, iters=3).collect()}
    assert max(got, key=got.get) == 0
    # quantized mass: conserved to within |V| units per iteration
    assert abs(sum(got.values()) - 10**12) < 11 * 3 * 100


def test_pagerank_checkpoint_cadence_bit_identical(spark):
    # checkpoint_every only materializes the rank table mid-unroll — the
    # integer grid makes every cadence bit-identical to the uncut lineage
    # (the r16 knob for many-iteration runs; see OPTIMIZATION_r16.md)
    rng = random.Random(7)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != 14]  # 14 dangling if present
    df = spark.createDataFrame(edges, "src long, dst long")
    want = {r.node: r.rank_q for r in pagerank(df, iters=6).collect()}
    for k in (1, 2, 4, 6, 99):
        got = {
            r.node: r.rank_q
            for r in pagerank(df, iters=6, checkpoint_every=k).collect()
        }
        assert got == want, f"cadence {k} diverged"
    assert want == brute_pagerank(edges, iters=6)


def test_pagerank_checkpoint_blocks_freed(spark):
    # r17 (ADVICE r16): checkpoint_every now goes through
    # local_checkpoint_with_free — each cadence point frees the PREVIOUS
    # round's RDD blocks immediately (they are dead once the next eager
    # checkpoint exists), and the LAST checkpoint's blocks are registered
    # with the tracked cache so clear_tracked_cache() reclaims them. A raw
    # r.localCheckpoint() leaked one non-evictable rank table per cadence
    # point for the lifetime of the driver.
    from query_engine_spark.cache import clear_tracked_cache
    from query_engine_spark.operators.behavior import pagerank

    clear_tracked_cache()
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    edges = [(i, (i + 1) % 9) for i in range(9)] + [(0, 5), (3, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iters=6, checkpoint_every=2)  # cadence points at 2, 4
    # construction is eager (localCheckpoint): only the LAST checkpoint's
    # blocks may be alive — the it=2 round's blocks were freed at it=4
    mid = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert len(mid) <= 1, f"previous cadence blocks leaked: {sorted(mid)}"
    out.collect()
    clear_tracked_cache()
    after = set(jsc.getPersistentRDDs().keySet().toArray()) - before
    assert not after, f"checkpoint blocks survived clear_tracked_cache: {sorted(after)}"


def test_transition_matrix_handcrafted(spark):
    import datetime as dt
    from query_engine_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a  (transitions: a->b, b->a)
        (1, 1, t0, "a"), (2, 1, t0 + dt.timedelta(minutes=1), "b"),
        (3, 1, t0 + dt.timedelta(minutes=2), "a"),
        # user 2: a -> b       (transition: a->b)
        (4, 2, t0, "a"), (5, 2, t0 + dt.timedelta(minutes=1), "b"),
        # user 3: single event, no transitions
        (6, 3, t0, "c"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {(r.src, r.dst): (r.cnt, r.src_cnt, r.prob_ppm) for r in transition_matrix(ev).collect()}
    assert got[("a", "b")] == (2, 2, 1_000_000)
    assert got[("b", "a")] == (1, 1, 1_000_000)
    assert len(got) == 2  # user 3 contributes nothing
