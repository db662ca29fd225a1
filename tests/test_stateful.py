"""Tests for stateful operators: sessionization (batch ≡ streaming) and the
incremental regex cache (warm ≡ cold)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from query_engine_spark.streaming.stateful import RegexCache, sessionize_batch, sessionize_stream


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions (3 events, then a 2h gap, then 2 events)
    for m in (0, 5, 10):
        rows.append((1, base + dt.timedelta(minutes=m)))
    for m in (130, 135):
        rows.append((1, base + dt.timedelta(minutes=m)))
    # user 2: one session
    for m in (0, 20):
        rows.append((2, base + dt.timedelta(minutes=m)))
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_batch(spark):
    out = sessionize_batch(_events(spark), gap_seconds=1800)
    got = {(r["user_id"], r["session_id"]): r["n_events"] for r in out.collect()}
    assert got == {(1, 1): 3, (1, 2): 2, (2, 1): 2}


def test_sessionize_stream_matches_batch(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "sess_events")
    src.write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.table("sessions_out").collect()
    # append mode emits only CLOSED sessions: user1's first session closed by
    # the 2h-later event; open sessions stay in state
    got = {(r["user_id"], r["n_events"]) for r in emitted}
    assert (1, 3) in got
    # every emitted session must agree with the batch computation
    batch = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in sessionize_batch(src, gap_seconds=1800).collect()
    }
    for r in emitted:
        assert (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"]) in batch


def test_regex_cache_warm_equals_cold(spark, posts):
    cache = RegexCache(pattern="(?i)spark")
    first_half = posts.filter(F.col("key") <= 4)
    cache.refresh(first_half)
    assert {r["id"] for r in cache.matches.collect()} == {"p0001"}
    assert cache.hwm == "p0004"

    # incremental refresh over the full store scans only id > p0004
    cache.refresh(posts)
    warm = {r["id"] for r in cache.matches.collect()}
    cold = {r["id"] for r in posts.filter(F.col("text").rlike("(?i)spark")).select("id").collect()}
    assert warm == cold == {"p0001"}
    assert cache.hwm == "p0008"

    # apply as semi/anti join on the working set
    kept = cache.apply(posts)
    assert [r["key"] for r in kept.collect()] == [1]
    dropped = cache.apply(posts, invert=True)
    assert sorted(r["key"] for r in dropped.collect()) == [2, 3, 4, 5, 6, 7, 8]


def test_regex_cache_large_set_drops_broadcast_hint(spark, posts):
    # past the broadcast threshold apply() must not FORCE a broadcast of the
    # match set (a hot regex at 100 TB can exceed broadcast limits) — the
    # hint disappears and the planner sizes the join from stats; results
    # agree with the broadcast path
    small = RegexCache(pattern=".")  # matches every post
    small.refresh(posts)
    big = RegexCache(pattern=".", broadcast_threshold=2)
    big.refresh(posts)
    assert big._n_matches > big.broadcast_threshold

    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    assert "ResolvedHint" in analyzed(small.apply(posts))
    assert "Hint" not in analyzed(big.apply(posts))
    a = sorted(r["key"] for r in small.apply(posts).collect())
    b = sorted(r["key"] for r in big.apply(posts).collect())
    assert a == b and len(a) >= 7  # key 7 has empty text — '.' no-match
