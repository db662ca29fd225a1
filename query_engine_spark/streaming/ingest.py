"""Ingest lifecycle (SURVEY §2.10 / §3 entry point 3).

The reference is a micro-batch ingester: a 5-second tick loop pages new rows
out of SurrealDB with a 1000-row overlap for late data, dedups on id, merges
count views copy-on-write, applies label retractions (`neg`), and evicts
beyond the retention window (/root/reference/src/main.rs:328-464, 3143-3285,
3815-3995, 1101-1175).

Spark mapping, batch-first (every function works on plain DataFrames and can
be driven by foreachBatch in Structured Streaming):

- idempotent incremental append: union + dropDuplicates(id) keep-latest —
  the overlap re-fetch dedup (main.rs:3195-3209);
- count-view merge: recompute per-key counts from the edge table and join —
  replaces copy-on-write map surgery (main.rs:3900-3920);
- label retraction: last-writer-wins by `seq` per (post, label), dropping
  rows whose last event is neg=true (main.rs:3959-3995);
- retention: a watermark predicate (serving view) or partition delete (storage).

The streaming variant (`streaming_windowed_counts`) shows the same pipeline
as a live Structured Streaming query with watermarked event-time windows.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = [
    "merge_incremental",
    "merge_counts",
    "apply_label_retractions",
    "retention_filter",
    "streaming_count_view",
    "streaming_windowed_counts",
    "streaming_interval_join",
    "streaming_dedup",
    "streaming_ohlc",
]


def merge_incremental(existing: DataFrame, batch: DataFrame, id_col: str = "id", seq_col: str | None = None) -> DataFrame:
    """Idempotent merge of an overlapping batch: keep the latest version of
    each id (by `seq_col` if given, else prefer the batch row)."""
    tagged_old = existing.withColumn("__src", F.lit(0))
    tagged_new = batch.withColumn("__src", F.lit(1))
    union = tagged_old.unionByName(tagged_new, allowMissingColumns=True)
    order = [F.col(seq_col).desc()] if seq_col else []
    w = Window.partitionBy(id_col).orderBy(*order, F.col("__src").desc())
    return union.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn", "__src")


def merge_counts(posts: DataFrame, edges: DataFrame, *, key: str = "key", edge_key: str = "post_key", out: str = "like_count") -> DataFrame:
    """Refresh a per-post count column from the edge table (count view merge,
    main.rs:3815-3923). Declarative recompute: agg + broadcast-friendly join."""
    counts = edges.groupBy(F.col(edge_key).alias(key)).agg(F.count("*").alias("__cnt"))
    return (
        posts.join(counts, key, "left")
        .withColumn(out, F.coalesce(F.col("__cnt"), F.lit(0)).cast("int"))
        .drop("__cnt")
    )


def apply_label_retractions(labels: DataFrame) -> DataFrame:
    """Resolve the label event stream to current assignments: for each
    (post_id, labeler_did, val) keep the event with the highest `seq`; if that
    event is a retraction (neg=true) the label is gone (main.rs:3959-3995)."""
    w = Window.partitionBy("post_id", "labeler_did", "val").orderBy(F.col("seq").desc())
    latest = labels.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return latest.filter(~F.coalesce(F.col("neg"), F.lit(False))).select("post_id", "labeler_did", "val", "seq")


def retention_filter(df: DataFrame, now: _dt.datetime, days: int = 7, ts: str = "ts") -> DataFrame:
    """The serving-window predicate (7-day post window, main.rs:218-222,
    1106-1110). On storage this is a date-partition delete; on the serving
    view it is this filter, which also prunes partitions."""
    cutoff = now - _dt.timedelta(days=days)
    return df.filter(F.col(ts) >= F.lit(cutoff))


def streaming_count_view(
    spark: SparkSession,
    edges: DataFrame,
    *,
    key: str = "post_key",
    query_name: str = "count_view",
) -> DataFrame:
    """A3 as a live incremental aggregation: per-key edge counts maintained
    in update mode — the streaming replacement for the reference's tiered
    count-view refresh loop (main.rs:353-443). Complete-mode memory sink so
    the drained table equals the batch groupBy (asserted in tests); in
    production this would be update-mode into a keyed sink/state store."""
    agg = edges.groupBy(key).agg(F.count("*").alias("cnt"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_windowed_counts(
    spark: SparkSession,
    source: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    query_name: str = "windowed_counts",
    complete: bool = True,
) -> DataFrame:
    """Event-time windowed counts per event_type as a Structured Streaming
    query, drained synchronously into a memory sink. Tumbling by default;
    pass `slide` for hopping (sliding) windows — the streaming counterpart
    of the batch `operators.temporal.hopping_windows` (test_stateful
    asserts stream == batch on the same data).

    complete=True emits every window each trigger → after
    processAllAvailable() the memory table equals the batch groupBy — which
    is exactly what the oracle checks. Watermark + append mode is the
    production configuration for unbounded sources.
    """
    win = F.window("ts", window, slide or window).alias("w")
    agg = source.groupBy(win, "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    if not complete:
        agg = (
            source.withWatermark("ts", watermark)
            .groupBy(win, "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        )
    q = (
        agg.writeStream.outputMode("complete" if complete else "append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_interval_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    query_name: str = "interval_join",
) -> DataFrame:
    """Watermarked stream-stream INNER interval join: every (l, r) pair
    with the same `key` and ``l.ts <= r.ts <= l.ts + within`` — the
    streaming counterpart of the batch `operators.temporal.range_join`
    (attribute each right event to the left events that precede it within
    a horizon; e.g. clicks to the views they follow).

    Both sides carry a `watermark`: with the time-range join condition,
    Spark bounds the buffered state to watermark + `within` per side and
    evicts older rows — without the range bound the state would grow
    unboundedly (this is the documented stream-stream join requirement).
    Output schema: (key, ts_l, ts_r, <left cols...>, <right cols...>)
    excluding the join/ts columns, left's prefixed `l_`, right's `r_`.

    Drained synchronously into a memory sink (append mode — the only mode
    stream-stream inner joins support); production would writeStream to a
    real sink with the same plan.
    """
    lv = [c for c in left.columns if c not in (key, left_ts)]
    rv = [c for c in right.columns if c not in (key, right_ts)]
    l = left.withWatermark(left_ts, watermark).select(
        F.col(key), F.col(left_ts).alias("__lts"), *[F.col(c).alias(f"l_{c}") for c in lv]
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(key).alias("__rkey"), F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"r_{c}") for c in rv],
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col("__rts") >= F.col("__lts"))
        & (F.col("__rts") <= F.col("__lts") + F.expr(f"INTERVAL {within}"))
    )
    j = l.join(r, cond).select(
        F.col(key),
        F.col("__lts").alias("ts_l"),
        F.col("__rts").alias("ts_r"),
        *[F.col(f"l_{c}") for c in lv],
        *[F.col(f"r_{c}") for c in rv],
    )
    q = (
        j.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_ohlc(
    spark: SparkSession,
    source: DataFrame,
    *,
    key: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "vc",
    window: str = "1 hour",
    query_name: str = "ohlc_stream",
) -> DataFrame:
    """OHLC candles as a live incremental aggregation — the streaming
    counterpart of `operators.temporal.ohlc`. Open/close use
    ``min_by/max_by(value, struct(ts, order_col))``: the struct's
    lexicographic order is the same TOTAL order the batch operator ranks
    by, so timestamp collisions resolve identically and stream == batch
    (asserted in tests). min_by/max_by are decomposable, so this runs as
    an ordinary incremental state update — no per-window sort, no
    row_number, state is one candle per (key, window).

    Complete-mode memory sink so the drained table equals the batch
    answer; production would use update mode + watermark into a keyed sink.
    """
    ordk = F.struct(F.col(ts_col), F.col(order_col))
    agg = source.groupBy(F.window(ts_col, window).alias("w"), key).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by(F.col(value_col), ordk).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), ordk).alias("close"),
    )
    out = agg.select(
        F.unix_micros(F.col("w.start")).alias("bucket_us"),
        key, "n_events", "open", "high", "low", "close",
    )
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)


def streaming_dedup(
    spark: SparkSession,
    source: DataFrame,
    *,
    id_col: str = "id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    query_name: str = "stream_dedup",
) -> DataFrame:
    """Streaming exact-once dedup: first-seen row per id wins, with state
    bounded by the watermark (`dropDuplicatesWithinWatermark` — ids older
    than the watermark horizon are evicted from state, so duplicate ids
    must arrive within the horizon to be caught; that is the documented
    trade of bounded state for bounded lookback, exactly the reference's
    1000-row overlap-dedup rephrased in event time).

    Append-mode memory sink for tests; production would write to a real
    sink. Batch equivalence: on bounded input with all duplicates inside
    the horizon, the result == batch `dropDuplicates([id])` up to which
    duplicate survives (streaming keeps the FIRST arrival; the test
    compares id sets).
    """
    dd = source.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(query_name)
