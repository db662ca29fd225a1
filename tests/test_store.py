"""E2E lifecycle test for the day-partitioned post store."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from query_engine_spark.streaming.job import PostStore

NOW = dt.datetime(2024, 3, 10, 12, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, NOW - dt.timedelta(days=d), v) for i, d, v in rows],
        "id long, ts timestamp, v string",
    )


def test_streaming_ingest_into_store(spark, tmp_path):
    """EP3 as Structured Streaming: readStream → foreachBatch(store.ingest)."""
    src = _batch(spark, [(1, 0.1, "a"), (2, 1.2, "b"), (2, 1.2, "b2"), (3, 2.5, "c")])
    src_path = str(tmp_path / "stream_src")
    src.write.parquet(src_path)
    store = PostStore(spark, str(tmp_path / "stream_store"))

    stream = spark.readStream.schema(src.schema).parquet(src_path)
    q = (
        stream.writeStream.foreachBatch(lambda batch, epoch: store.ingest(batch))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"] for r in store.read().collect()}
    assert got == {1, 2, 3}  # in-batch duplicate id=2 deduped


def test_salted_agg_exact(spark):
    from query_engine_spark.operators.aggregates import salted_agg
    from pyspark.sql import functions as F

    # one hot key (90% of rows) + tail
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    counts = {r["k"]: r["v_count"] for r in salted_agg(df, "k", {"v": "count"}).collect()}
    sums = {r["k"]: r["v_sum"] for r in salted_agg(df, "k", {"v": "sum"}).collect()}
    exact_c = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("v").alias("c")).collect()}
    exact_s = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert counts == exact_c and sums == exact_s


def test_store_lifecycle(spark, tmp_path):
    store = PostStore(spark, str(tmp_path / "store"))

    # initial load: 3 days
    store.ingest(_batch(spark, [(1, 0.1, "a"), (2, 1.2, "b"), (3, 9.5, "old")]))
    assert store.read().count() == 3

    # overlapping re-ingest: id=2 updated, id=4 new (same day as 1)
    store.ingest(_batch(spark, [(2, 1.2, "b2"), (4, 0.2, "c")]))
    got = {r["id"]: r["v"] for r in store.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "old", 4: "c"}  # idempotent, latest wins

    # re-ingesting the same batch changes nothing
    store.ingest(_batch(spark, [(2, 1.2, "b2"), (4, 0.2, "c")]))
    assert store.read().count() == 4

    # serving view: 7-day window excludes the old row
    view = store.serving_view(NOW, days=7)
    assert sorted(r["id"] for r in view.collect()) == [1, 2, 4]

    # partition pruning: the dt filter reaches the scan
    plan = view._jdf.queryExecution().executedPlan().toString()
    assert "dt" in plan

    # eviction spills the old day to the archive
    archive = str(tmp_path / "archive")
    moved = store.evict(NOW, days=8, archive_path=archive)
    assert len(moved) == 1 and moved[0].startswith("dt=2024-02-29" [:3])
    assert store.read().count() == 3
    assert store.archive_view(archive).count() == 1
    assert store.archive_view(archive).collect()[0]["id"] == 3


def test_store_compaction(spark, tmp_path):
    """Micro-batch ingest leaves one file per batch per day; compact() must
    merge them down to the byte-optimal count, preserve every row, keep the
    id sort, and be a no-op when partitions are already tight."""
    import os

    store = PostStore(spark, str(tmp_path / "cstore"))
    # PostStore.ingest rewrites whole day partitions, so it never accumulates
    # files — the small-file buildup comes from APPEND-mode writers into the
    # same layout (a streaming parquet sink emits one file per micro-batch
    # per partition). Simulate 6 micro-batches:
    for i in range(6):
        (
            _batch(spark, [(100 + i, 0.1, f"v{i}")])
            .withColumn("dt", F.date_format(F.col("ts"), "yyyy-MM-dd"))
            .coalesce(1)
            .write.mode("append")
            .partitionBy("dt")
            .parquet(store.path)
        )
    day_dir = next(
        os.path.join(store.path, e) for e in os.listdir(store.path) if e.startswith("dt=")
    )
    files_before = [f for f in os.listdir(day_dir) if f.endswith(".parquet")]
    assert len(files_before) > 1
    before = {(r["id"], r["v"]) for r in store.read().collect()}

    rewritten = store.compact(target_bytes=64 * 1024 * 1024)
    assert rewritten, "small-file partition was not compacted"
    files_after = [f for f in os.listdir(day_dir) if f.endswith(".parquet")]
    assert len(files_after) == 1  # tiny data -> one byte-optimal file
    assert {(r["id"], r["v"]) for r in store.read().collect()} == before

    # idempotent: nothing left to compact
    assert store.compact(target_bytes=64 * 1024 * 1024) == {}

    # older_than_days guard: today's partition is live -> untouched
    for i in range(3):
        (
            _batch(spark, [(200 + i, 0.1, f"w{i}")])
            .withColumn("dt", F.date_format(F.col("ts"), "yyyy-MM-dd"))
            .coalesce(1)
            .write.mode("append")
            .partitionBy("dt")
            .parquet(store.path)
        )
    assert store.compact(target_bytes=64 * 1024 * 1024, older_than_days=1, now=NOW) == {}
