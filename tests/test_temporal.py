"""Unit tests for operators/temporal.py and operators/sketches.py —
handcrafted frames with known answers, plus plan-shape assertions (the
as-of join must be a single shuffle, the range join must not be a
cartesian product)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from query_engine_spark.operators.sketches import group_quantiles, kmv_distinct
from query_engine_spark.operators.temporal import (
    asof_join,
    hopping_windows,
    range_join,
    rollup_gapfill,
    time_bucket,
)


# ---------------------------------------------------------------------------
# as-of join


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts_us=100, qty=1),
            Row(sym="A", ts_us=205, qty=2),
            Row(sym="A", ts_us=300, qty=3),  # exact tie with quote at 300
            Row(sym="B", ts_us=50, qty=4),  # before any B quote -> null
            Row(sym="B", ts_us=900, qty=5),
        ]
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts_us=90, px=1.0),
            Row(sym="A", ts_us=200, px=2.0),
            Row(sym="A", ts_us=300, px=3.0),
            Row(sym="B", ts_us=800, px=8.0),
        ]
    )
    return trades, quotes


def test_asof_backward_matches_latest_prior(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], value_cols=["px"], left_ts="ts_us", right_ts="ts_us"
    )
    got = {(r.sym, r.ts_us): (r.ts_us_r, r.px_r) for r in out.collect()}
    assert got[("A", 100)] == (90, 1.0)
    assert got[("A", 205)] == (200, 2.0)
    # equal timestamps match (backward-inclusive)
    assert got[("A", 300)] == (300, 3.0)
    # no prior quote -> NULL match
    assert got[("B", 50)] == (None, None)
    assert got[("B", 900)] == (800, 8.0)
    # left join: every left row survives
    assert out.count() == trades.count()


def test_asof_tolerance_nulls_stale_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        value_cols=["px"],
        left_ts="ts_us",
        right_ts="ts_us",
        tolerance=10,
    )
    got = {(r.sym, r.ts_us): r.px_r for r in out.collect()}
    assert got[("A", 100)] == 1.0  # gap 10 == tolerance -> kept
    assert got[("A", 205)] == 2.0  # gap 5 -> kept
    assert got[("A", 300)] == 3.0  # gap 0 -> kept
    assert got[("B", 900)] is None  # gap 100 > tolerance -> nulled
    assert got[("B", 50)] is None  # no match at all


def test_asof_tolerance_exact_boundaries(spark):
    left = spark.createDataFrame([Row(k=1, ts_us=100), Row(k=1, ts_us=111)])
    right = spark.createDataFrame([Row(k=1, ts_us=90, v=7.0)])
    out = asof_join(
        left, right, on=["k"], value_cols=["v"], left_ts="ts_us", right_ts="ts_us", tolerance=10
    )
    got = {r.ts_us: r.v_r for r in out.collect()}
    assert got[100] == 7.0  # gap exactly == tolerance: kept
    assert got[111] is None  # gap 21 > tolerance: nulled


def test_asof_single_shuffle(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on=["sym"], value_cols=["px"], left_ts="ts_us", right_ts="ts_us"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union+LOCF formulation: exactly one Exchange (the key partition), no join
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_asof_forward_and_nearest(spark, trades_quotes):
    trades, quotes = trades_quotes
    fwd = asof_join(
        trades, quotes, on=["sym"], value_cols=["px"],
        left_ts="ts_us", right_ts="ts_us", direction="forward",
    )
    got = {(r.sym, r.ts_us): r.px_r for r in fwd.collect()}
    # A@100 -> earliest quote >= 100 is 200; A@300 ties inclusive; B@900 none
    assert got[("A", 100)] == 2.0
    assert got[("A", 300)] == 3.0
    assert got[("B", 50)] == 8.0
    assert got[("B", 900)] is None
    near = asof_join(
        trades, quotes, on=["sym"], value_cols=["px"],
        left_ts="ts_us", right_ts="ts_us", direction="nearest",
    )
    got = {(r.sym, r.ts_us): r.px_r for r in near.collect()}
    # A@205: backward 200 (d=5) beats forward 300 (d=95)
    assert got[("A", 205)] == 2.0
    # A@100: backward 90 (d=10) vs forward 200 (d=100) -> backward
    assert got[("A", 100)] == 1.0
    assert got[("B", 50)] == 8.0  # only forward exists
    # nearest still a single shuffle: identical range-frame window specs share
    # one Window node, one Sort, one Exchange (AQE prints the pre-collect
    # initial plan too — count only the final section)
    plan = near._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, plan
    assert final.count("Window") == 1, plan


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential test: asof_join == pandas.merge_asof
    (backward, by-key, tolerance) on seeded random frames."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 200),
                "ts_us": rng.choice(10_000, 200, replace=False).astype("int64"),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 150),
                "ts_us": rng.choice(10_000, 150, replace=False).astype("int64"),
                "v": rng.random(150),
            }
        )
        # merge_asof needs unique (k, ts); choice(replace=False) gives unique
        # ts globally, so (k, ts) is unique too
        tol = 500
        for direction in ("backward", "forward", "nearest"):
            want = pd.merge_asof(
                left.sort_values("ts_us"),
                right.sort_values("ts_us"),
                on="ts_us",
                by="k",
                direction=direction,
                tolerance=tol,
            )
            got = asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on=["k"],
                value_cols=["v"],
                left_ts="ts_us",
                right_ts="ts_us",
                tolerance=tol,
                direction=direction,
            ).toPandas()
            wm = {(r.k, r.ts_us): r.v for r in want.itertuples()}
            gm = {(r.k, r.ts_us): r.v_r for r in got.itertuples()}
            assert set(wm) == set(gm)
            for key in wm:
                a, b = wm[key], gm[key]
                assert (pd.isna(a) and pd.isna(b)) or a == b, (seed, direction, key, a, b)


def test_range_join_matches_bruteforce(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    pts = [int(x) for x in rng.integers(0, 1000, 120)]
    ivls = [
        (i, int(s), int(s + rng.integers(0, 80)))
        for i, s in enumerate(rng.integers(0, 1000, 40))
    ]
    points = spark.createDataFrame([Row(p=p, pid=i) for i, p in enumerate(pts)])
    intervals = spark.createDataFrame([Row(iid=i, s=s, e=e) for i, s, e in ivls])
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(points, intervals, "p", "s", "e", bin_width=50).collect()
    )
    want = sorted(
        (pi, ii) for pi, p in enumerate(pts) for ii, s, e in ivls if s <= p <= e
    )
    assert got == want


# ---------------------------------------------------------------------------
# range join


def test_range_join_containment_and_exactly_once(spark):
    points = spark.createDataFrame(
        [Row(p=0), Row(p=5), Row(p=10), Row(p=15), Row(p=25), Row(p=99)]
    )
    # interval spanning many bins; bin_width deliberately tiny (3) so each
    # interval explodes into several bins — pairs must still be unique
    intervals = spark.createDataFrame(
        [Row(iid=1, s=0, e=10), Row(iid=2, s=10, e=20), Row(iid=3, s=90, e=95)]
    )
    out = range_join(points, intervals, "p", "s", "e", bin_width=3)
    pairs = sorted((r.p, r.iid) for r in out.collect())
    # inclusive both ends: p=10 is in both [0,10] and [10,20]; p=99 matches none
    assert pairs == [(0, 1), (5, 1), (10, 1), (10, 2), (15, 2)]
    # exactly-once: no dedup pass, so duplicates would show up here
    assert len(pairs) == len(set(pairs))


def test_range_join_no_cartesian(spark):
    points = spark.createDataFrame([Row(p=i) for i in range(50)])
    intervals = spark.createDataFrame([Row(iid=i, s=i * 10, e=i * 10 + 9) for i in range(5)])
    out = range_join(points, intervals, "p", "s", "e", bin_width=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    assert out.count() == 50  # every point in exactly one interval here


# ---------------------------------------------------------------------------
# time_bucket + rollup_gapfill


def test_time_bucket_floors_to_width(spark):
    df = spark.createDataFrame([Row(ts_us=0), Row(ts_us=999), Row(ts_us=1000), Row(ts_us=2500)])
    got = [r.b for r in df.select(time_bucket("ts_us", 1000).alias("b")).collect()]
    assert got == [0, 0, 1000, 2000]


def test_rollup_gapfill_zero_and_locf(spark):
    # key 'a': buckets 0,1000,3000 present -> 2000 is a gap
    df = spark.createDataFrame(
        [
            Row(k="a", ts_us=10, v=1.0),
            Row(k="a", ts_us=1500, v=3.0),
            Row(k="a", ts_us=3100, v=5.0),
            Row(k="b", ts_us=500, v=7.0),
        ]
    )
    out = rollup_gapfill(
        df,
        keys=["k"],
        ts_us_col="ts_us",
        width_us=1000,
        aggs={"n": F.count("*"), "av": F.avg("v")},
        zero_cols=["n"],
        locf_cols=["av"],
    ).orderBy("k", "bucket_us")
    rows = [(r.k, r.bucket_us, r.n, r.av) for r in out.collect()]
    assert rows == [
        ("a", 0, 1, 1.0),
        ("a", 1000, 1, 3.0),
        ("a", 2000, 0, 3.0),  # gap: count zero-filled, gauge carried forward
        ("a", 3000, 1, 5.0),
        ("b", 0, 1, 7.0),  # single-bucket key: no spurious spine rows
    ]


def test_rollup_gapfill_linear_interp(spark):
    # gauge observed at buckets 0 (v=1.0) and 3000 (v=7.0); gaps at 1000,
    # 2000 interpolate linearly: 3.0 and 5.0
    df = spark.createDataFrame(
        [Row(k="a", ts_us=10, v=1.0), Row(k="a", ts_us=3100, v=7.0)]
    )
    out = rollup_gapfill(
        df,
        keys=["k"],
        ts_us_col="ts_us",
        width_us=1000,
        aggs={"g": F.max("v")},
        interp_cols=["g"],
    ).orderBy("bucket_us")
    assert [(r.bucket_us, r.g) for r in out.collect()] == [
        (0, 1.0),
        (1000, 3.0),
        (2000, 5.0),
        (3000, 7.0),
    ]


def test_hopping_windows_membership(spark):
    # width 10, slide 5: t=12 belongs to windows starting at 5 and 10;
    # t=10 sits on a slide boundary -> [5,15) and [10,20), NOT [15,25)
    df = spark.createDataFrame([Row(ts_us=12), Row(ts_us=10), Row(ts_us=27)])
    out = hopping_windows(df, "ts_us", width_us=10, slide_us=5)
    got = sorted((r.ts_us, r.window_start_us) for r in out.collect())
    assert got == [(10, 5), (10, 10), (12, 5), (12, 10), (27, 20), (27, 25)]
    # every row lands in exactly width/slide windows
    assert out.count() == 6


def test_group_quantiles_exact(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=float(x)) for x in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]]
        + [Row(g="b", v=float(x)) for x in [10, 20, 30]]
    )
    out = {r.g: (r.q25, r.q50, r.q90) for r in
           group_quantiles(df, ["g"], "v", quantiles=(0.25, 0.5, 0.9)).collect()}
    # percentile_disc: rank = max(1, ceil(q*n)), 1-indexed ascending
    assert out["a"] == (3.0, 5.0, 9.0)  # ceil(2.5)=3, ceil(5)=5, ceil(9)=9
    assert out["b"] == (10.0, 20.0, 30.0)  # ceil(0.75)=1, ceil(1.5)=2, ceil(2.7)=3


def test_balanced_sample_caps_strata(spark):
    from query_engine_spark.llmdata.textstats import balanced_sample

    rows = [Row(doc_id=i, lang="en") for i in range(1000)] + [
        Row(doc_id=10_000 + i, lang="de") for i in range(50)
    ]
    out = balanced_sample(spark.createDataFrame(rows), "lang")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # de (smallest stratum) keeps everything; en downsampled to ~50
    assert counts["de"] == 50
    assert 25 <= counts["en"] <= 85, counts
    # deterministic: same result on re-run
    out2 = balanced_sample(spark.createDataFrame(rows), "lang")
    assert sorted(r.doc_id for r in out.collect()) == sorted(r.doc_id for r in out2.collect())


# ---------------------------------------------------------------------------
# KMV sketch


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([Row(g="x", v=i % 10) for i in range(100)])
    out = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert out.exact_distinct == 10
    assert out.kmv_distinct == 10.0  # below k -> exact


def test_kmv_estimate_above_k_is_close(spark):
    df = spark.createDataFrame([Row(g="x", v=i) for i in range(2000)])
    out = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert out.exact_distinct == 2000
    # k=64 -> ~13% standard error; allow 3 sigma
    assert abs(out.kmv_distinct - 2000) / 2000 < 0.4, out.kmv_distinct


def test_kmv_set_ops_exact_below_k(spark):
    from query_engine_spark.operators.sketches import kmv_set_ops

    # A = {0..9}, B = {5..14}: union 15, inter 5 — both fully sketched at
    # k=64, so every estimate is exact
    rows = [Row(s="A", v=i) for i in range(10)] + [
        Row(s="B", v=i) for i in range(5, 15)
    ]
    df = spark.createDataFrame(rows)
    out = kmv_set_ops(df, "s", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.set_a, r.set_b) == ("A", "B")
    assert r.union_est == 15.0
    assert r.jaccard_est == 5.0 / 15.0
    assert r.inter_est == 5.0


def test_kmv_set_ops_estimate_close_and_all_pairs(spark):
    from query_engine_spark.operators.sketches import kmv_set_ops

    # A = 0..1999, B = 1000..2999, C disjoint: union(A,B)=3000, inter=1000
    rows = (
        [Row(s="A", v=i) for i in range(2000)]
        + [Row(s="B", v=i) for i in range(1000, 3000)]
        + [Row(s="C", v=i) for i in range(10_000, 10_500)]
    )
    df = spark.createDataFrame(rows)
    got = {(r.set_a, r.set_b): r for r in kmv_set_ops(df, "s", "v", k=64).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert abs(ab.union_est - 3000) / 3000 < 0.4, ab
    assert abs(ab.jaccard_est - 1 / 3) < 0.25, ab
    assert abs(ab.inter_est - 1000) / 1000 < 0.75, ab
    # disjoint pairs: zero shared hashes -> exactly zero estimates
    assert got[("A", "C")].jaccard_est == 0.0
    assert got[("A", "C")].inter_est == 0.0
    assert got[("B", "C")].jaccard_est == 0.0


def test_kmv_set_ops_broadcast_gate_fallback_identical(spark):
    """The r17 broadcast gate (verdict r16 item 4): past
    _KMV_BROADCAST_MAX_SETS the sketch self-join drops the broadcast hint
    and degrades to a partitioned non-broadcast join instead of
    hard-failing the 8 GB broadcast cap. The fallback path must produce
    identical estimates, and forcing the gate OFF must really remove the
    broadcast hint from the plan."""
    from query_engine_spark.operators import sketches as Sk

    rows = [Row(s="A", v=i) for i in range(10)] + [
        Row(s="B", v=i) for i in range(5, 15)
    ] + [Row(s="C", v=i) for i in range(200)]
    df = spark.createDataFrame(rows)
    on = sorted(map(tuple, Sk.kmv_set_ops(df, "s", "v", k=64, broadcast_sketches=True).collect()))
    off = sorted(map(tuple, Sk.kmv_set_ops(df, "s", "v", k=64, broadcast_sketches=False).collect()))
    assert on == off and len(on) == 3
    # the auto gate counts the sets (3 <= max) and broadcasts
    auto = sorted(map(tuple, Sk.kmv_set_ops(df, "s", "v", k=64).collect()))
    assert auto == on
    # plan check: no BroadcastNestedLoopJoin without the hint
    plan_off = Sk.kmv_set_ops(df, "s", "v", k=64, broadcast_sketches=False)._jdf.queryExecution().executedPlan().toString()
    plan_on = Sk.kmv_set_ops(df, "s", "v", k=64, broadcast_sketches=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan_on
    assert "BroadcastNestedLoopJoin" not in plan_off


def test_kmeans_lloyd_separates_clear_clusters(spark):
    from query_engine_spark.llmdata.similarity import kmeans_lloyd

    # two tight angular clusters around (1,0) and (0,1); k=2 inits on the two
    # lowest ids, one drawn from each cluster
    rows = [Row(vec_id=2 * i, embedding=[1.0, 0.01 * i]) for i in range(10)] + [
        Row(vec_id=2 * i + 1, embedding=[0.01 * i, 1.0]) for i in range(10)
    ]
    out = kmeans_lloyd(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        k=2,
        iters=2,
    )
    got = {r.vec_id: r.cent_id for r in out.collect()}
    evens = {got[v] for v in range(0, 20, 2)}
    odds = {got[v] for v in range(1, 20, 2)}
    assert evens == {0} and odds == {1}, got


def test_kmv_matches_duckdb(spark):
    """The whole point of KMV-on-md5: DuckDB reproduces the estimate
    bit-for-bit (Spark HLL estimates can't)."""
    import duckdb

    df = spark.createDataFrame([Row(g="g%d" % (i % 3), v=i * 7) for i in range(600)])
    got = {
        r.g: (r.exact_distinct, r.kmv_distinct)
        for r in kmv_distinct(df, ["g"], "v", k=64).collect()
    }
    con = duckdb.connect()
    want = {}
    pdf = df.toPandas()
    con.register("src", pdf)
    rows = con.execute(
        """
        WITH d AS (
          SELECT DISTINCT g, ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM src
        ), r AS (
          SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM d
        )
        SELECT g, count(*),
               CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                    ELSE 63.0 * 1152921504606846976.0 /
                         CAST(max(CASE WHEN rk <= 64 THEN h END) AS DOUBLE) END
        FROM r GROUP BY g
        """
    ).fetchall()
    for g, n, est in rows:
        want[g] = (n, est)
    assert got == want


def test_group_quantiles_bucketed_vs_exact(spark):
    """Bucket width 1 over integer values == exact group_quantiles."""
    from query_engine_spark.operators import sketches as Sk

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", float(v * 3)) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, value double")
    exact = {r.g: (r.q25, r.q50, r.q90) for r in
             Sk.group_quantiles(df, ["g"], "value", (0.25, 0.5, 0.9)).collect()}
    bucketed = {r.g: (r.q25_lo, r.q50_lo, r.q90_lo) for r in
                Sk.group_quantiles_bucketed(df, ["g"], "value", (0.25, 0.5, 0.9), bucket_width=1).collect()}
    for g in exact:
        assert bucketed[g] == tuple(int(v) for v in exact[g]), (g, exact[g], bucketed[g])


def test_truncated_ema_handcrafted(spark):
    import datetime as dt
    from query_engine_spark.operators.temporal import truncated_ema, ema_weights

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=i), "a", 10.0) for i in range(4)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    got = {r.event_id: r.ema_q for r in
           truncated_ema(ev, "value", key_cols=("event_type",)).collect()}
    # constant series: EMA == the value at every position (head renormalizes)
    assert all(v == 10_000 for v in got.values()), got
    # kernel sanity: weights are the alpha-geometric sequence, integer, shared literals
    ws = ema_weights(0.5, 8)
    assert ws[0] == 2**19 and ws[1] == 2**18 and len(ws) == 8
    # step series: second point of [0, 10] -> (w0*10000 + w1*0) / (w0+w1)
    ev2 = spark.createDataFrame(
        [(0, t0, "a", 0.0), (1, t0 + dt.timedelta(minutes=1), "a", 10.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    got2 = {r.event_id: r.ema_q for r in
            truncated_ema(ev2, "value", key_cols=("event_type",)).collect()}
    assert got2[0] == 0 and got2[1] == (ws[0] * 10_000) // (ws[0] + ws[1])


def test_ohlc_candles(spark):
    import datetime as dt

    from query_engine_spark.operators.temporal import ohlc
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # bucket 10:00 — out-of-order arrival, a timestamp collision at :05
        (1, base + dt.timedelta(minutes=5), "a", 30),
        (2, base + dt.timedelta(minutes=1), "a", 10),
        (3, base + dt.timedelta(minutes=5), "a", 40),   # same ts as id 1
        (4, base + dt.timedelta(minutes=50), "a", 20),
        # bucket 11:00
        (5, base + dt.timedelta(minutes=65), "a", 99),
        # other key
        (6, base + dt.timedelta(minutes=2), "b", 7),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, k string, v long")
    ev = ev.withColumn("ts_us", F.unix_micros("ts"))
    out = {(r["k"], r["bucket_us"]): r for r in ohlc(ev, "ts_us", "event_id", "v", ["k"], 3_600_000_000).collect()}
    h10 = out[("a", int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000)]
    # open = earliest (id 2); close = latest (id 4); the :05 collision breaks
    # ties by event_id, so high=40 comes from id 3 but open stays id 2's 10
    assert (h10["open"], h10["high"], h10["low"], h10["close"], h10["n_events"]) == (10, 40, 10, 20, 4)
    h11 = out[("a", int((base + dt.timedelta(hours=1)).replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000)]
    assert (h11["open"], h11["close"], h11["n_events"]) == (99, 99, 1)
    assert out[("b", h10["bucket_us"])]["open"] == 7


def test_ohlc_single_exchange(spark):
    # both row_number windows and the final agg must share ONE (key, bucket)
    # exchange — a second shuffle would double the cost of every candle query
    import io
    import contextlib

    from query_engine_spark import registry

    df = registry.REGISTRY["events_ohlc"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]  # the operator tree, not the detail
    assert tree.count("Exchange") == 1, tree


def test_countmin_one_sided_error_and_merge(spark):
    """CM guarantees: est >= exact always; small sketches collide and only
    OVERcount; two partition sketches merged by pointwise add equal the
    whole-data sketch."""
    import pyspark.sql.functions as F
    from query_engine_spark.operators import sketches as Sk

    rows = [(i % 7,) for i in range(700)] + [(100 + i,) for i in range(50)]
    df = spark.createDataFrame(rows, "user_id long")
    sketch = Sk.countmin_sketch(df, "user_id", d=4, w=32)  # tiny -> collisions
    items = df.select("user_id").distinct()
    est = {r.user_id: r.cm_est for r in
           Sk.countmin_estimate(sketch, items, "user_id", d=4, w=32).collect()}
    exact = {r.user_id: r.cnt for r in
             df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert all(est[u] >= exact[u] for u in exact)  # one-sided
    # heavy hitters dominate their buckets: the 7 heavy users estimate
    # within eps*N of truth for w=32 (eps ~ e/32, N=750 -> slack ~64)
    assert all(est[u] - exact[u] <= 5 * 750 / 32 for u in range(7))

    # mergeability: sketch(A) + sketch(B) == sketch(A union B)
    a = df.filter(F.col("user_id") < 50)
    b = df.filter(F.col("user_id") >= 50)
    merged = (
        Sk.countmin_sketch(a, "user_id", d=4, w=32)
        .unionByName(Sk.countmin_sketch(b, "user_id", d=4, w=32))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r.row, r.bucket): r.cnt for r in
             Sk.countmin_sketch(df, "user_id", d=4, w=32).collect()}
    got = {(r.row, r.bucket): r.cnt for r in merged.collect()}
    assert got == whole


def test_rolling_anomaly_flags_planted_spike(spark):
    from datetime import datetime, timedelta
    from query_engine_spark.operators.temporal import rolling_anomaly

    t0 = datetime(2024, 1, 1)
    rows = []
    # steady alternating baseline (variance > 0), one spike at i=40
    for i in range(60):
        v = 10.0 if i % 2 == 0 else 12.0
        if i == 40:
            v = 500.0
        rows.append(("a", t0 + timedelta(seconds=i), i, v))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    out = rolling_anomaly(df, "value", lookback=16, min_n=8, z=3).collect()
    assert [r["event_id"] for r in out] == [40]
    r = out[0]
    assert r["value_q"] == 500000 and r["dev2"] > r["thr2"]


def test_rolling_anomaly_excludes_current_row_from_baseline(spark):
    """Two consecutive spikes: the first must still be flagged (its own
    value not in its baseline); the second sees the first in ITS baseline
    but one outlier among 16 alternating values still leaves it >3 sigma
    of the pre-spike window only if variance stays small — just assert
    the first spike is flagged and no baseline row is."""
    from datetime import datetime, timedelta
    from query_engine_spark.operators.temporal import rolling_anomaly

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        v = 10.0 if i % 2 == 0 else 12.0
        if i in (30, 31):
            v = 400.0
        rows.append(("a", t0 + timedelta(seconds=i), i, v))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    flagged = {r["event_id"] for r in rolling_anomaly(df, "value", lookback=16, min_n=8, z=3).collect()}
    assert 30 in flagged
    assert not (flagged - {30, 31})


def test_rolling_anomaly_min_n_gate(spark):
    from datetime import datetime, timedelta
    from query_engine_spark.operators.temporal import rolling_anomaly

    t0 = datetime(2024, 1, 1)
    rows = [("a", t0 + timedelta(seconds=i), i, 10.0 + (i % 2)) for i in range(5)]
    rows.append(("a", t0 + timedelta(seconds=9), 9, 999.0))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    # only 5 predecessors < min_n=8 -> nothing can fire
    assert rolling_anomaly(df, "value", lookback=16, min_n=8, z=3).count() == 0


def test_anomaly_baseline_null_values_do_not_trip_the_guard(spark):
    """A key whose values are all NULL yields null moments (downstream
    var_q>0 filters drop it) — the int64-budget guard must not turn that
    into a spurious assert failure (assert_true raises on NULL)."""
    from query_engine_spark.operators.temporal import anomaly_baseline

    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 1.5), ("b", 2.5), ("b", 100.0)],
        "event_type string, value double",
    )
    rows = {r.event_type: (r.n, r.mean_q, r.var_q) for r in anomaly_baseline(df).collect()}
    assert rows["a"] == (2, None, None)
    assert rows["b"][0] == 3 and rows["b"][1] is not None


def test_anomaly_score_static_null_moments_do_not_trip_the_guard(spark):
    """ADVICE r6: the score-side int64 guard must tolerate NULL itself —
    the shipped composition only avoided a spurious raise because Catalyst
    pushed IsNotNull constraints (inferred from var_q>0 / dev*dev) below
    the guard. Run with constraint propagation DISABLED (the exact
    fragility: without the inferred IsNotNull pushdown the unescaped guard
    sees the null-moment rows) and feed a null-moment baseline row plus a
    null value: must not raise. Confirmed to reproduce the pre-fix raise."""
    from datetime import datetime

    from query_engine_spark.operators.temporal import anomaly_baseline, anomaly_score_static

    t0 = datetime(2024, 1, 1)
    base_src = spark.createDataFrame(
        [("a", None), ("a", None)]
        + [("b", float(10 + (i % 2))) for i in range(20)],
        "event_type string, value double",
    )
    baseline = anomaly_baseline(base_src)
    # key "a" carries null mean_q/var_q into the broadcast join; a null
    # value on key "b" makes dev NULL on the probe side
    pts = spark.createDataFrame(
        [("a", t0, 1, 5.0), ("b", t0, 2, None), ("b", t0, 3, 999.0)],
        "event_type string, ts timestamp, event_id long, value double",
    )
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        out = anomaly_score_static(pts, baseline, min_n=8, z=3)
        rows = out.collect()  # must not raise through the assert_true guard
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    assert {r.event_id for r in rows} == {3}
