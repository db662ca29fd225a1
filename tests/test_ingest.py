"""Ingestion lifecycle tests (SURVEY §2.10): idempotent merge, count views,
label retraction, retention, and the streaming windowed agg."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from query_engine_spark.streaming.ingest import (
    apply_label_retractions,
    merge_counts,
    merge_incremental,
    retention_filter,
)
from tests.conftest import NOW


def test_merge_incremental_idempotent(spark):
    existing = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    batch = spark.createDataFrame([("b", 2), ("c", 1)], "id string, v int")
    merged = merge_incremental(existing, batch, "id")
    got = {r["id"]: r["v"] for r in merged.collect()}
    # overlap row 'b' takes the batch version (late-data overlap re-fetch,
    # main.rs:3195-3209)
    assert got == {"a": 1, "b": 2, "c": 1}
    # re-merging the same batch changes nothing (idempotence)
    again = merge_incremental(merged, batch, "id")
    assert {r["id"]: r["v"] for r in again.collect()} == got


def test_merge_counts(spark, posts, likes):
    refreshed = merge_counts(posts, likes, key="key", edge_key="post_key", out="like_count")
    got = {r["key"]: r["like_count"] for r in refreshed.collect()}
    assert got[1] == 2 and got[3] == 2 and got[6] == 2 and got[5] == 2
    assert got[7] == 0  # no likes → 0 (copy-on-write default)


def test_label_retraction(spark):
    rows = [
        ("did:l", "nsfw", "p1", False, 1),
        ("did:l", "nsfw", "p1", True, 2),   # retracted later → gone
        ("did:l", "nsfw", "p2", True, 1),
        ("did:l", "nsfw", "p2", False, 2),  # re-applied later → present
        ("did:l", "spam", "p1", False, 5),
    ]
    labels = spark.createDataFrame(rows, "labeler_did string, val string, post_id string, neg boolean, seq long")
    got = {(r["post_id"], r["val"]) for r in apply_label_retractions(labels).collect()}
    assert got == {("p2", "nsfw"), ("p1", "spam")}


def test_retention(posts):
    kept = retention_filter(posts, NOW, days=7)
    assert kept.count() == posts.count()  # all fixtures within 7d
    kept1 = retention_filter(posts, NOW, days=1)
    assert sorted(r["key"] for r in kept1.collect()) == [1, 2, 3, 7, 8]


def test_streaming_count_view(spark, tmp_path, likes):
    from query_engine_spark.streaming.ingest import streaming_count_view

    path = str(tmp_path / "likes_stream")
    likes.write.parquet(path)
    stream = spark.readStream.schema(likes.schema).parquet(path)
    out = streaming_count_view(spark, stream, query_name="t_cv")
    got = {r["post_key"]: r["cnt"] for r in out.collect()}
    batch = {r["post_key"]: r["c"] for r in likes.groupBy("post_key").agg(F.count("*").alias("c")).collect()}
    assert got == batch


def test_streaming_windowed_counts(spark, tmp_path):
    # drive the streaming pipeline from a parquet directory source
    from query_engine_spark.streaming.ingest import streaming_windowed_counts

    src = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, i), "a", 1.0) for i in range(12)],
        "ts timestamp, event_type string, value double",
    )
    path = str(tmp_path / "events")
    src.write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = streaming_windowed_counts(spark, stream, window="5 minutes", query_name="t_wc")
    got = {(r["w"]["start"].minute, r["n"]) for r in out.collect()}
    assert got == {(0, 5), (5, 5), (10, 2)}
    # complete-mode streaming result == batch aggregation (the oracle property)
    batch = src.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.sum("value").alias("total")
    )
    assert {tuple(r) for r in out.select("n", "total").collect()} == {
        tuple(r) for r in batch.select("n", "total").collect()
    }


def test_streaming_sliding_equals_batch_hopping(spark, tmp_path):
    """Structured Streaming F.window(w, slide) == the batch
    operators.temporal.hopping_windows formulation on the same data."""
    from query_engine_spark.operators.temporal import hopping_windows
    from query_engine_spark.streaming.ingest import streaming_windowed_counts

    src = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 3 * i), "a", float(i)) for i in range(20)],
        "ts timestamp, event_type string, value double",
    )
    path = str(tmp_path / "events_slide")
    src.write.parquet(path)
    stream = spark.readStream.schema(src.schema).parquet(path)
    out = streaming_windowed_counts(
        spark, stream, window="10 minutes", slide="5 minutes", query_name="t_hop"
    )
    got = {
        (int(r["w"]["start"].timestamp() * 1_000_000), r["event_type"]): r["n"]
        for r in out.collect()
    }
    batch = (
        hopping_windows(
            src.withColumn("ts_us", F.unix_micros("ts")),
            "ts_us",
            width_us=600_000_000,
            slide_us=300_000_000,
        )
        .groupBy("window_start_us", "event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r.window_start_us, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_streaming_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the plain batch join with
    the same (key, time-range) condition."""
    from query_engine_spark.streaming.ingest import streaming_interval_join

    views = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), "v1"),
            (1, dt.datetime(2024, 1, 1, 0, 20), "v2"),
            (2, dt.datetime(2024, 1, 1, 0, 5), "v3"),
            (3, dt.datetime(2024, 1, 1, 1, 0), "v4"),  # no click within 30m
        ],
        "user_id long, ts timestamp, page string",
    )
    clicks = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 10), 1.0),   # joins v1
            (1, dt.datetime(2024, 1, 1, 0, 25), 2.0),   # joins v1 AND v2
            (2, dt.datetime(2024, 1, 1, 0, 50), 3.0),   # 45m after v3: outside
            (1, dt.datetime(2023, 12, 31, 23, 0), 4.0), # before any view
        ],
        "user_id long, ts timestamp, amount double",
    )
    vp, cp = str(tmp_path / "views"), str(tmp_path / "clicks")
    views.write.parquet(vp)
    clicks.write.parquet(cp)
    out = streaming_interval_join(
        spark,
        spark.readStream.schema(views.schema).parquet(vp),
        spark.readStream.schema(clicks.schema).parquet(cp),
        within="30 minutes",
        query_name="t_ij",
    )
    got = {
        (r.user_id, r.ts_l, r.ts_r, r.l_page, r.r_amount) for r in out.collect()
    }
    batch = (
        views.alias("l")
        .join(
            clicks.alias("r"),
            (F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts") >= F.col("l.ts"))
            & (F.col("r.ts") <= F.col("l.ts") + F.expr("INTERVAL 30 minutes")),
        )
        .select(
            F.col("l.user_id"), F.col("l.ts").alias("ts_l"),
            F.col("r.ts").alias("ts_r"), F.col("l.page"), F.col("r.amount"),
        )
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    assert len(got) == 3  # v1-c1, v1-c2, v2-c2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from query_engine_spark.streaming.ingest import streaming_dedup

    src = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0), "a"),
            (1, dt.datetime(2024, 1, 1, 0, 5), "b"),   # dup id within horizon
            (2, dt.datetime(2024, 1, 1, 0, 1), "c"),
            (3, dt.datetime(2024, 1, 1, 0, 2), "d"),
            (3, dt.datetime(2024, 1, 1, 0, 2), "d"),   # exact dup row
        ],
        "id long, ts timestamp, v string",
    )
    path = str(tmp_path / "dedup_stream")
    src.write.parquet(path)
    out = streaming_dedup(
        spark,
        spark.readStream.schema(src.schema).parquet(path),
        query_name="t_dd",
    )
    ids = sorted(r.id for r in out.collect())
    assert ids == [1, 2, 3]
    # batch equivalence on id sets
    assert ids == sorted(
        r.id for r in src.dropDuplicates(["id"]).collect()
    )


def test_streaming_lm_score_static_lm(spark, tmp_path):
    """Stream-side perplexity filter, the production shape: train the bigram
    LM OFFLINE (batch ngram_lm), score the document STREAM against it via a
    stream-static join + per-doc aggregation. Streaming result must equal
    scoring the same micro-batch in batch mode."""
    from query_engine_spark.llmdata import textstats as Tx

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "c a b a")],
        "doc_id long, text string",
    )
    lm = Tx.ngram_lm(docs, 2, min_count=2)  # pretrained, static
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    scored = Tx.lm_score_docs(stream, lm)
    q = (
        scored.writeStream.format("memory")
        .queryName("t_lms")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.doc_id: (r.n_grams, r.oov, r.sum_prob_q, r.score_q)
            for r in spark.table("t_lms").collect()
        }
    finally:
        q.stop()
    batch = {
        r.doc_id: (r.n_grams, r.oov, r.sum_prob_q, r.score_q)
        for r in Tx.lm_score_docs(docs, lm).collect()
    }
    assert got == batch and len(got) == 3


def test_streaming_classifier_score_static_model(spark, tmp_path):
    """Stream-side quality gate: train the hashed classifier OFFLINE, score
    the document STREAM against the broadcast model (stream-static join +
    one stateful agg). Streaming result must equal batch scoring with the
    same pretrained model and prior."""
    from query_engine_spark.llmdata import textstats as Tx
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", True), (2, "uno dos tres", False),
         (3, "alpha dos beta", True)],
        "doc_id long, text string, y boolean",
    )
    w = Tx.train_hashed_classifier(docs, F.col("y"), n_buckets=64)
    prior_q = 0  # balanced demo prior
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    scored = Tx.hashed_classifier_score(stream, w, prior_q=prior_q, n_buckets=64)
    q = (
        scored.writeStream.format("memory")
        .queryName("t_clf")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.doc_id: (r.n_tokens, r.score_q, r.pred)
            for r in spark.table("t_clf").collect()
        }
    finally:
        q.stop()
    batch = {
        r.doc_id: (r.n_tokens, r.score_q, r.pred)
        for r in Tx.hashed_classifier_score(docs, w, prior_q=prior_q, n_buckets=64).collect()
    }
    assert got == batch and len(got) == 3

    # guard rails: stream without prior_q, and double-prior
    import pytest

    with pytest.raises(ValueError, match="prior_q"):
        Tx.hashed_classifier_score(stream, w, F.col("y"), n_buckets=64)
    with pytest.raises(ValueError, match="exactly one"):
        Tx.hashed_classifier_score(docs, w, F.col("y"), prior_q=1, n_buckets=64)


def test_streaming_countmin_sketch(spark, tmp_path):
    """The count-min build is one explode + one stateful agg, so the same
    operator runs on a stream; the streamed sketch must equal the batch
    sketch of the same data (mergeable frequency state on the firehose)."""
    from query_engine_spark.operators import sketches as Sk

    df = spark.createDataFrame([(i % 5,) for i in range(200)], "user_id long")
    path = str(tmp_path / "cm_stream")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (
        Sk.countmin_sketch(stream, "user_id", d=4, w=32)
        .writeStream.format("memory")
        .queryName("t_cm")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.row, r.bucket): r.cnt for r in spark.table("t_cm").collect()}
    finally:
        q.stop()
    want = {(r.row, r.bucket): r.cnt
            for r in Sk.countmin_sketch(df, "user_id", d=4, w=32).collect()}
    assert got == want and sum(want.values()) == 4 * 200


def test_streaming_dsir_score_static_ratios(spark, tmp_path):
    """Stream-side DSIR: train the ratio table OFFLINE on a snapshot, score
    the document STREAM against the broadcast table — one stateless gram
    explode + ratio join, one stateful doc agg. Stream == batch with the
    same pretrained table."""
    from query_engine_spark.llmdata import textstats as Tx
    import pyspark.sql.functions as F
    import pytest

    docs = spark.createDataFrame(
        [(1, "climate science energy policy"), (2, "zzz qqq www eee"),
         (3, "climate policy zzz www")],
        "doc_id long, text string",
    )
    target = docs.filter(F.col("doc_id") == 1)
    ratios = Tx.dsir_ratio_table(docs, target, n_buckets=256)
    path = str(tmp_path / "dsir_stream")
    docs.write.parquet(path)
    stream = spark.readStream.schema(docs.schema).parquet(path)
    q = (
        Tx.dsir_weights(stream, ratios=ratios, n_buckets=256)
        .writeStream.format("memory").queryName("t_dsir")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
        got = {r.doc_id: (r.n_grams, r.dsir_weight_q)
               for r in spark.table("t_dsir").collect()}
    finally:
        q.stop()
    batch = {r.doc_id: (r.n_grams, r.dsir_weight_q)
             for r in Tx.dsir_weights(docs, ratios=ratios, n_buckets=256).collect()}
    assert got == batch and len(got) == 3
    # target-like doc still outweighs off-domain under the pretrained table
    assert got[1][1] > got[2][1]

    with pytest.raises(ValueError, match="exactly one"):
        Tx.dsir_weights(docs, target, ratios=ratios)
    with pytest.raises(ValueError, match="train offline"):
        Tx.dsir_weights(stream, target)


def test_streaming_anomaly_score_static_baseline(spark, tmp_path):
    """Stream-side anomaly monitor: train the per-key baseline OFFLINE,
    score the event STREAM against the broadcast moments (map-only
    stream-static join, append mode, no state). Streaming result must
    equal batch scoring with the same baseline."""
    from datetime import datetime, timedelta
    from query_engine_spark.operators.temporal import anomaly_baseline, anomaly_score_static

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        v = 10.0 if i % 2 == 0 else 12.0
        if i == 33:
            v = 300.0
        rows.append(("a", t0 + timedelta(seconds=i), i, v))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    baseline = anomaly_baseline(ev.filter("event_id < 30"), "value")

    path = str(tmp_path / "ev_stream")
    ev.write.parquet(path)
    stream = spark.readStream.schema(ev.schema).parquet(path)
    scored = anomaly_score_static(stream, baseline, min_n=8, z=3)
    q = scored.writeStream.format("memory").queryName("t_anom").outputMode("append").start()
    try:
        q.processAllAvailable()
        got = {(r.event_id, r.value_q, r.dev2, r.thr2) for r in spark.table("t_anom").collect()}
    finally:
        q.stop()
    batch = {
        (r.event_id, r.value_q, r.dev2, r.thr2)
        for r in anomaly_score_static(ev, baseline, min_n=8, z=3).collect()
    }
    assert got == batch
    assert {e for e, *_ in got} == {33}
