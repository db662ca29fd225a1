"""Composed end-to-end streaming job: readStream → watermarked dedup →
incremental windowed counts → checkpointed parquet sink, asserted equal to
the batch answer — including across a mid-stream restart (VERDICT r4 #3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from query_engine_spark.streaming.compose import (
    composed_batch_answer,
    composed_ingest_result,
    composed_ingest_start,
)

_SCHEMA = "id long, user_id long, event_type string, value double, ts timestamp"
_BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _ev(i: int, minute: float, etype: str, value: float):
    return (i, i % 7, etype, value, _BASE + dt.timedelta(minutes=minute))


def _batches(spark):
    """Three micro-batch files with cross-file duplicate ids (the reference's
    1000-row overlap re-fetch) plus a final flush sentinel past the horizon."""
    b1 = [_ev(1, 0, "view", 1.0), _ev(2, 1, "view", 2.0), _ev(3, 2, "like", 1.0),
          _ev(4, 6, "view", 4.0)]
    # overlap: ids 3 and 4 re-fetched with identical payloads
    b2 = [_ev(3, 2, "like", 1.0), _ev(4, 6, "view", 4.0), _ev(5, 7, "like", 3.0),
          _ev(6, 11, "view", 1.0)]
    b3 = [_ev(6, 11, "view", 1.0), _ev(7, 12, "like", 2.0), _ev(8, 16, "view", 5.0)]
    # sentinel: advances the watermark past every real window's end + horizon
    flush = [_ev(999, 24 * 60, "__flush__", 0.0)]
    return [spark.createDataFrame(b, _SCHEMA) for b in (b1, b2, b3, flush)]


def test_composed_job_matches_batch_across_restart(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches(spark)

    # phase 1: two files, then a hard stop (simulated failure)
    batches[0].coalesce(1).write.mode("append").parquet(input_dir)
    batches[1].coalesce(1).write.mode("append").parquet(input_dir)
    q = composed_ingest_start(spark, input_dir, output_dir, ckpt, window="5 minutes",
                              watermark="10 minutes", max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    # phase 2: resume from the SAME checkpoint with the remaining files
    batches[2].coalesce(1).write.mode("append").parquet(input_dir)
    batches[3].coalesce(1).write.mode("append").parquet(input_dir)
    q2 = composed_ingest_start(spark, input_dir, output_dir, ckpt, window="5 minutes",
                               watermark="10 minutes", max_files_per_trigger=1)
    q2.processAllAvailable()
    q2.stop()

    got = {
        (r["win_start"], r["event_type"], r["n"], float(r["total"]))
        for r in composed_ingest_result(spark, output_dir)
        .filter(F.col("event_type") != "__flush__")
        .collect()
    }
    all_events = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {
        (r["win_start"], r["event_type"], r["n"], float(r["total"]))
        for r in composed_batch_answer(spark, all_events, window="5 minutes").collect()
    }
    assert got == want
    # duplicates were actually present and actually removed: id 3,4,6 appear
    # twice in the input but exactly once in the counts
    n_total = sum(n for (_, _, n, _) in got)
    assert n_total == 8  # 8 distinct real ids


def test_streaming_content_dedup_matches_batch(spark, tmp_path):
    """The llmdata curation pipeline's exact-dedup stage in incremental mode
    (VERDICT r4 optional #8): a documents stream deduped on the md5 CONTENT
    fingerprint (not the id) with watermark-bounded state — same fingerprint
    rule as llmdata/dedup.exact_dedup, so a batch backfill and the live
    stream keep identical documents."""
    from pyspark.sql import functions as F

    from query_engine_spark.streaming.ingest import streaming_dedup

    rows = []
    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon", "gamma delta",
             "zeta eta", "alpha beta", "theta"]
    for i, text in enumerate(texts):
        rows.append((i, text, _BASE + dt.timedelta(minutes=i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(path)
        .withColumn("fp", F.md5("text"))
    )
    out = streaming_dedup(spark, stream, id_col="fp", ts_col="ts",
                          query_name="content_dedup")
    got_fps = {r["fp"] for r in out.collect()}
    batch = docs.withColumn("fp", F.md5("text")).dropDuplicates(["fp"])
    want_fps = {r["fp"] for r in batch.collect()}
    assert got_fps == want_fps
    assert out.count() == 5  # 8 docs, 3 duplicate texts removed


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    """Streaming candles (min_by/max_by over the (ts, id) struct) must equal
    the batch ohlc operator (row_number over the same total order) —
    including on a timestamp collision, where both resolve by event_id."""
    from pyspark.sql import functions as F

    from query_engine_spark.operators.temporal import ohlc
    from query_engine_spark.streaming.ingest import streaming_ohlc

    rows = [
        (1, _BASE + dt.timedelta(minutes=5), "a", 30),
        (2, _BASE + dt.timedelta(minutes=1), "a", 10),
        (3, _BASE + dt.timedelta(minutes=5), "a", 40),   # ts collision with id 1
        (4, _BASE + dt.timedelta(minutes=50), "a", 20),
        (5, _BASE + dt.timedelta(minutes=65), "a", 99),
        (6, _BASE + dt.timedelta(minutes=2), "b", 7),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, vc long")
    path = str(tmp_path / "ohlc_events")
    ev.write.parquet(path)

    stream = spark.readStream.schema(ev.schema).parquet(path)
    got = {
        (r["event_type"], r["bucket_us"], r["n_events"], r["open"], r["high"], r["low"], r["close"])
        for r in streaming_ohlc(spark, stream, query_name="ohlc_stream_t").collect()
    }
    batch = ohlc(
        ev.withColumn("ts_us", F.unix_micros("ts")),
        "ts_us", "event_id", "vc", ["event_type"], 3_600_000_000,
    )
    want = {
        (r["event_type"], r["bucket_us"], r["n_events"], r["open"], r["high"], r["low"], r["close"])
        for r in batch.collect()
    }
    assert got == want and len(got) == 3


def test_composed_job_exactly_once_sink(spark, tmp_path):
    """Replaying the same input dir against the same checkpoint emits nothing
    new (exactly-once sink semantics, not at-least-once)."""
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches(spark)
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(input_dir)
    q = composed_ingest_start(spark, input_dir, output_dir, ckpt)
    q.processAllAvailable()
    q.stop()
    n1 = composed_ingest_result(spark, output_dir).count()
    # restart with no new input: no duplicate emission
    q2 = composed_ingest_start(spark, input_dir, output_dir, ckpt)
    q2.processAllAvailable()
    q2.stop()
    n2 = composed_ingest_result(spark, output_dir).count()
    assert n1 == n2 > 0


def test_streaming_media_perceptual_dedup_matches_batch(spark, tmp_path):
    """The incremental PERCEPTUAL media probe inside the streaming compose
    job (VERDICT r6 item 6 — the crawl-ingest shape): each micro-batch is
    dHashed once, probed against the parquet band index of earlier batches
    only, and appended to the index. Two-phase parity: after streaming
    batch A then batch B, the matches sink must equal the BATCH probe of
    B's bands against A's bands (the media mirror of
    test_streaming_content_dedup_matches_batch)."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_ingest_matches,
        media_ingest_start,
    )

    def maker(i: int) -> bytes:
        return MM.make_bmp(i % 6, 28, 20)

    in_dir, index_dir, matches_dir, ckpt = (
        str(tmp_path / n) for n in ("in", "idx", "matches", "ckpt")
    )
    df_a = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(8)], "media_id long, payload binary"
    )
    df_b = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(8, 16)], "media_id long, payload binary"
    )
    df_a.coalesce(1).write.mode("append").parquet(in_dir)
    q = media_ingest_start(spark, in_dir, index_dir, matches_dir, ckpt)
    try:
        q.processAllAvailable()
        # batch A seeds the index; no history yet -> no matches
        assert media_ingest_matches(spark, matches_dir).count() == 0
        assert spark.read.parquet(index_dir).count() == 8
        df_b.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in media_ingest_matches(spark, matches_dir).collect()
    }
    want = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in MM.perceptual_probe_pairs(
            MM.dhash_bands(df_b), MM.dhash_bands(df_a), max_hamming=3
        ).collect()
    }
    assert got == want
    # the planted pattern reuse (i % 6) guarantees real cross-batch matches
    assert len(want) >= 8
    # the index now covers both batches, hashed exactly once each
    assert spark.read.parquet(index_dir).count() == 16


def test_streaming_media_dedup_jpeg_hasher_matches_batch(spark, tmp_path):
    """The pluggable-hasher path the docstring promises for COMPRESSED
    crawls: media_ingest_start(hasher=jpeg_dhash_bands) over a lossy JPEG
    corpus must equal the batch probe of the same hasher's bands — the
    streaming mirror of media_jpeg_perceptual_dedup's decode→dHash
    composition (stream == batch on identical inputs)."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_ingest_matches,
        media_ingest_start,
    )

    def maker(i: int) -> bytes:
        return MM.make_jpeg(i % 6, 2, 2)

    in_dir, index_dir, matches_dir, ckpt = (
        str(tmp_path / n) for n in ("in", "idx", "matches", "ckpt")
    )
    df_a = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(8)], "media_id long, payload binary"
    )
    df_b = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(8, 16)], "media_id long, payload binary"
    )
    df_a.coalesce(1).write.mode("append").parquet(in_dir)
    q = media_ingest_start(
        spark, in_dir, index_dir, matches_dir, ckpt, hasher=MM.jpeg_dhash_bands
    )
    try:
        q.processAllAvailable()
        assert media_ingest_matches(spark, matches_dir).count() == 0
        df_b.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in media_ingest_matches(spark, matches_dir).collect()
    }
    want = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in MM.perceptual_probe_pairs(
            MM.jpeg_dhash_bands(df_b), MM.jpeg_dhash_bands(df_a), max_hamming=3
        ).collect()
    }
    assert got == want
    # i % 6 pattern reuse plants exact JPEG re-encodes across batches
    assert len(want) >= 8


def test_streaming_media_dedup_survives_restart(spark, tmp_path):
    """Checkpoint continuity for the media-ingest job: stop the query
    after batch A, start a NEW query on the same checkpoint, feed batch B
    — batch numbering must continue (B probes A through the __batch_id <
    current filter) and the final matches equal the batch probe, exactly
    as if the query had never restarted."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_ingest_matches,
        media_ingest_start,
    )

    def maker(i: int) -> bytes:
        return MM.make_bmp(i % 4, 24, 16)

    in_dir, index_dir, matches_dir, ckpt = (
        str(tmp_path / n) for n in ("in", "idx", "matches", "ckpt")
    )
    df_a = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(6)], "media_id long, payload binary"
    )
    df_b = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(6, 12)], "media_id long, payload binary"
    )
    df_a.coalesce(1).write.mode("append").parquet(in_dir)
    q1 = media_ingest_start(spark, in_dir, index_dir, matches_dir, ckpt)
    q1.processAllAvailable()
    q1.stop()  # simulate driver restart between crawl batches

    df_b.coalesce(1).write.mode("append").parquet(in_dir)
    q2 = media_ingest_start(spark, in_dir, index_dir, matches_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in media_ingest_matches(spark, matches_dir).collect()
    }
    want = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in MM.perceptual_probe_pairs(
            MM.dhash_bands(df_b), MM.dhash_bands(df_a), max_hamming=3
        ).collect()
    }
    assert got == want and len(want) >= 6
    assert spark.read.parquet(index_dir).count() == 12


def test_media_index_compact_preserves_probe_semantics(spark, tmp_path):
    """Compacting the committed per-batch partitions of the band index
    (the streaming small-file problem) must not change any future probe's
    visible set: after folding batches 0..N-1 onto id N-1, a new batch's
    matches equal the uncompacted run's, the row count is unchanged, and
    the old tiny partitions are gone."""
    import pathlib

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_index_compact,
        media_ingest_matches,
        media_ingest_start,
    )

    def maker(i: int) -> bytes:
        return MM.make_bmp(i % 5, 20, 12)

    in_dir, index_dir, matches_dir, ckpt = (
        str(tmp_path / n) for n in ("in", "idx", "matches", "ckpt")
    )
    # three single-file micro-batches -> three index partitions (the
    # source dir must exist before the stream starts)
    spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(0, 4)],
        "media_id long, payload binary",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q = media_ingest_start(spark, in_dir, index_dir, matches_dir, ckpt,
                           max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        for lo in (4, 8):
            spark.createDataFrame(
                [(i, bytearray(maker(i))) for i in range(lo, lo + 4)],
                "media_id long, payload binary",
            ).coalesce(1).write.mode("append").parquet(in_dir)
            q.processAllAvailable()
        assert len(list(pathlib.Path(index_dir).glob("__batch_id=*"))) == 3

        media_index_compact(spark, index_dir, upto_batch=3)
        parts = sorted(p.name for p in pathlib.Path(index_dir).glob("__batch_id=*"))
        assert parts == ["__batch_id=2"]
        assert spark.read.parquet(index_dir).count() == 12

        # batch 3 probes the compacted history identically
        spark.createDataFrame(
            [(i, bytearray(maker(i))) for i in range(12, 16)],
            "media_id long, payload binary",
        ).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["media_id"], r["match_id"])
        for r in media_ingest_matches(spark, matches_dir).collect()
        if r["media_id"] >= 12
    }
    hist = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(12)], "media_id long, payload binary"
    )
    new = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(12, 16)], "media_id long, payload binary"
    )
    want = {
        (r["media_id"], r["match_id"])
        for r in MM.perceptual_probe_pairs(
            MM.dhash_bands(new), MM.dhash_bands(hist), max_hamming=3
        ).collect()
    }
    assert got == want and len(want) >= 4


def test_streaming_media_dedup_jpeg_hasher(spark, tmp_path):
    """The compressed-crawl variant: media_ingest_start with
    hasher=jpeg_dhash_bands decodes baseline JPEGs inside foreachBatch and
    probes on the decoded-pixel dHash — matches equal the batch probe of
    the same hasher."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_ingest_matches,
        media_ingest_start,
    )

    def maker(i: int) -> bytes:
        return MM.make_jpeg(i % 4, 2, 2)

    in_dir, index_dir, matches_dir, ckpt = (
        str(tmp_path / n) for n in ("in", "idx", "matches", "ckpt")
    )
    df_a = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(6)], "media_id long, payload binary"
    )
    df_b = spark.createDataFrame(
        [(i, bytearray(maker(i))) for i in range(6, 12)], "media_id long, payload binary"
    )
    df_a.coalesce(1).write.mode("append").parquet(in_dir)
    q = media_ingest_start(
        spark, in_dir, index_dir, matches_dir, ckpt, hasher=MM.jpeg_dhash_bands
    )
    try:
        q.processAllAvailable()
        df_b.coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in media_ingest_matches(spark, matches_dir).collect()
    }
    want = {
        (r["media_id"], r["match_id"], r["hamming"])
        for r in MM.perceptual_probe_pairs(
            MM.jpeg_dhash_bands(df_b), MM.jpeg_dhash_bands(df_a), max_hamming=3
        ).collect()
    }
    assert got == want and len(want) >= 6


def test_streaming_archive_ingest_matches_batch_and_restart(spark, tmp_path):
    """Streaming archive ingest == batch extraction, across a driver
    restart: crawl drop A (zips) lands, the query stops, drop B lands, a
    NEW query on the same checkpoint continues — the final corpus equals
    one batch `archive_documents` over all drops, each document exactly
    once (dynamic partition overwrite keyed by micro-batch id)."""
    from query_engine_spark.llmdata import archives as AR
    from query_engine_spark.streaming.compose import (
        archive_ingest_docs,
        archive_ingest_start,
    )

    def drop(lo: int, hi: int):
        rows = [(d, f"doc {d} payload " * (1 + d % 3)) for d in range(lo, hi)]
        return AR.pack_archives(
            spark.createDataFrame(rows, "doc_id long, text string"), fmt="zip",
            group_size=4,
        )

    in_dir, docs_dir, ckpt = (str(tmp_path / n) for n in ("in", "docs", "ckpt"))
    drop(0, 10).coalesce(1).write.mode("append").parquet(in_dir)
    q1 = archive_ingest_start(spark, in_dir, docs_dir, ckpt)
    q1.processAllAvailable()
    q1.stop()  # simulate driver restart between crawl drops

    drop(10, 25).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = archive_ingest_start(spark, in_dir, docs_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {(r["doc_id"], r["text"]) for r in archive_ingest_docs(spark, docs_dir).collect()}
    want = {(d, f"doc {d} payload " * (1 + d % 3)) for d in range(25)}
    assert got == want
    # exactly-once: no duplicate doc rows across batch partitions
    assert archive_ingest_docs(spark, docs_dir).count() == 25


def test_streaming_outlink_graph_matches_batch_and_restart(spark, tmp_path):
    """Streaming outlink ingest == batch extraction over all pages,
    across a driver restart, with the graph assembled by summing
    per-batch PARTIAL edge counts — the same host pair seen in several
    micro-batches must fold to one row with the total, and a replayed
    batch must not double-count (dynamic partition overwrite)."""
    from query_engine_spark.llmdata.warc import outlink_edges
    from query_engine_spark.streaming.compose import (
        outlink_graph,
        outlink_ingest_start,
    )

    def pages(lo: int, hi: int):
        rows = [
            (
                f"https://dom{d % 5}.example/p/{d}",
                f'<a href="https://dom{(d + 1) % 5}.example/x">a</a>'
                f"<a href='/self/{d}'>s</a>"
                f'<a href="mailto:x@y.z">m</a>',
            )
            for d in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "url string, html string")

    in_dir, edges_dir, ckpt = (str(tmp_path / n) for n in ("in", "edges", "ckpt"))
    pages(0, 12).coalesce(1).write.mode("append").parquet(in_dir)
    q1 = outlink_ingest_start(spark, in_dir, edges_dir, ckpt)
    q1.processAllAvailable()
    q1.stop()  # driver restart between crawl drops

    pages(12, 30).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = outlink_ingest_start(spark, in_dir, edges_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        (r["src_host"], r["dst_host"]): r["links"]
        for r in outlink_graph(spark, edges_dir).collect()
    }
    want = {
        (r["src_host"], r["dst_host"]): r["links"]
        for r in outlink_edges(pages(0, 30)).collect()
    }
    assert got == want
    # the same host pair appears in BOTH drops: partials really folded
    assert any(v > 1 for v in got.values())


def test_outlink_compact_preserves_graph(spark, tmp_path):
    """Compacting the edge sink pre-aggregates old batch partials into
    one partition without changing the visible graph, and a post-compact
    drop keeps accumulating on top."""
    import pathlib

    from query_engine_spark.llmdata.warc import outlink_edges
    from query_engine_spark.streaming.compose import (
        outlink_compact,
        outlink_graph,
        outlink_ingest_start,
    )

    def pages(lo, hi):
        rows = [
            (
                f"https://dom{d % 3}.example/p/{d}",
                f'<a href="https://dom{(d + 1) % 3}.example/x">a</a>',
            )
            for d in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "url string, html string")

    in_dir, edges_dir, ckpt = (str(tmp_path / n) for n in ("in", "edges", "ckpt"))
    pages(0, 9).coalesce(1).write.mode("append").parquet(in_dir)
    q = outlink_ingest_start(spark, in_dir, edges_dir, ckpt, max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        pages(9, 21).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        before = {
            (r["src_host"], r["dst_host"]): r["links"]
            for r in outlink_graph(spark, edges_dir).collect()
        }
        parts_before = len(list(pathlib.Path(edges_dir).glob("__batch_id=*")))
        assert parts_before >= 2
        outlink_compact(spark, edges_dir, upto_batch=2)
        after = {
            (r["src_host"], r["dst_host"]): r["links"]
            for r in outlink_graph(spark, edges_dir).collect()
        }
        assert after == before
        assert len(list(pathlib.Path(edges_dir).glob("__batch_id=*"))) == 1
        # ingestion continues on top of the compacted history
        pages(21, 27).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    final = {
        (r["src_host"], r["dst_host"]): r["links"]
        for r in outlink_graph(spark, edges_dir).collect()
    }
    want = {
        (r["src_host"], r["dst_host"]): r["links"]
        for r in outlink_edges(pages(0, 27)).collect()
    }
    assert final == want


def test_streaming_crawl_lifecycle_end_to_end(spark, tmp_path):
    """The whole streaming crawl loop in one test: page drops stream in,
    the host graph accumulates as batch partials, compaction folds them
    mid-stream, and host rank computed over the ACCUMULATED graph is
    bit-identical to pagerank over the batch edge set — the quality
    prior a scheduler would feed back into frontier ordering."""
    from query_engine_spark.llmdata.warc import outlink_edges
    from query_engine_spark.operators import behavior as B
    from query_engine_spark.streaming.compose import (
        outlink_compact,
        outlink_graph,
        outlink_ingest_start,
    )
    from pyspark.sql import functions as F

    def pages(lo, hi):
        rows = [
            (
                f"https://h{d % 11}.example/p/{d}",
                f'<a href="https://h{(d * 3 + 1) % 11}.example/x">a</a>'
                f'<a href="https://h{(d * 7 + 2) % 11}.example/y">b</a>',
            )
            for d in range(lo, hi)
        ]
        return spark.createDataFrame(rows, "url string, html string")

    in_dir, edges_dir, ckpt = (str(tmp_path / n) for n in ("in", "edges", "ckpt"))
    pages(0, 40).coalesce(1).write.mode("append").parquet(in_dir)
    q = outlink_ingest_start(spark, in_dir, edges_dir, ckpt, max_files_per_trigger=1)
    try:
        q.processAllAvailable()
        pages(40, 90).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        outlink_compact(spark, edges_dir, upto_batch=2)
        pages(90, 120).coalesce(1).write.mode("append").parquet(in_dir)
        q.processAllAvailable()
    finally:
        q.stop()

    stream_edges = (
        outlink_graph(spark, edges_dir)
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
    )
    batch_edges = (
        outlink_edges(pages(0, 120))
        .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
        .distinct()
    )
    got = {(r["node"], r["rank_q"]) for r in B.pagerank(stream_edges, iters=3).collect()}
    want = {(r["node"], r["rank_q"]) for r in B.pagerank(batch_edges, iters=3).collect()}
    assert got == want and len(got) == 11


def test_streaming_media_triage_matches_batch_and_restart(spark, tmp_path):
    """Streaming sniff->dispatch triage == the batch dispatch over all
    drops, across a driver restart: mixed media drop A lands, the query
    stops, drop B lands, a NEW query on the same checkpoint continues —
    the final census equals one batch sniff+dispatch pass over
    everything, each payload exactly once."""
    import pyspark.sql.functions as F

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import webp as WB
    from query_engine_spark.streaming.compose import (
        media_triage_census,
        media_triage_ingest_start,
    )

    def payload(i: int) -> bytes:
        sel = i % 5
        if sel == 0:
            return MM.make_png(i, 4 + i % 5, 3 + i % 4)
        if sel == 1:
            return MM.make_gif(i, 28 + i % 5, 18 + i % 4)
        if sel == 2:
            return WB.make_webp(i, 9 + i % 4, 8 + i % 3)
        if sel == 3:
            return MM.make_wav(i, 600 + (i % 7) * 100)
        return bytes((i * 7 + k) % 251 + 1 for k in range(24))

    def drop(lo: int, hi: int):
        return spark.createDataFrame(
            [(i, bytearray(payload(i))) for i in range(lo, hi)],
            "media_id long, payload binary",
        )

    in_dir, census_dir, ckpt = (str(tmp_path / n) for n in ("in", "census", "ckpt"))
    drop(0, 12).coalesce(1).write.mode("append").parquet(in_dir)
    q1 = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    q1.processAllAvailable()
    q1.stop()  # driver restart between crawl drops

    drop(12, 30).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    batch_form = MM.decode_dispatch_features(
        drop(0, 30).withColumn("mtype", MM.sniff_media_type(F.col("payload")))
    )
    key = lambda r: (r["media_id"], r["mtype"], r["width"], r["height"],
                     r["n_samples"], r["content_sum"])
    got = sorted(key(r) for r in media_triage_census(spark, census_dir).collect())
    want = sorted(key(r) for r in batch_form.collect())
    assert got == want and len(got) == 30


def test_media_triage_survives_in_family_variant_poison(spark, tmp_path):
    """ADVICE r9 (medium), streaming form: ONE decodable-family-but-
    unsupported-variant payload in a crawl drop (a stereo WAV, a color
    JPEG, an RGB TIFF) must not wedge the checkpointed triage ingest —
    before the fix the family decoder's NotImplementedError (or the
    color JPEG's TypeError) escaped foreachBatch, the batch never
    committed, and the restart replayed the same poison forever. Now the
    census lands honest-NULL rows for the variants, real values for the
    color JPEG, and the stream keeps going."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_triage_census,
        media_triage_ingest_start,
    )

    rows = [
        (0, bytearray(MM.make_png(0, 4, 3))),          # healthy
        (1, bytearray(MM.make_wav_stereo(1, 80))),     # variant -> NULLs
        (2, bytearray(MM.make_jpeg_color(2, 2, 2))),   # folds natively now
        (3, bytearray(MM.make_tiff_rgb(3, 5, 4))),     # variant -> NULLs
    ]
    in_dir, census_dir, ckpt = (str(tmp_path / n) for n in ("in", "census", "ckpt"))
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    q = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = {r["media_id"]: r for r in media_triage_census(spark, census_dir).collect()}
    assert len(got) == 4
    assert got[0]["mtype"] == "image/png" and got[0]["content_sum"] is not None
    assert got[2]["mtype"] == "image/jpeg" and got[2]["content_sum"] is not None
    for mid, mt in ((1, "audio/wav"), (3, "image/tiff")):
        r = got[mid]
        assert r["mtype"] == mt
        assert (r["width"], r["height"], r["n_samples"], r["content_sum"]) == (
            None, None, None, None,
        )


def test_media_triage_survives_corrupt_payload_poison(spark, tmp_path):
    """ADVICE r10 (low), streaming form: ONE corrupt-but-correctly-
    sniffed payload (CRC-flipped PNG, truncated WAV) in a crawl drop
    must not wedge the checkpointed triage ingest — the family
    decoder's ValueError previously escaped foreachBatch, the batch
    never committed, and the restart replayed the same poison forever
    (the same wedge the NotImplementedError fix closed, triggered by
    corruption instead of an unsupported variant). Quarantine mode
    lands corrupt=true NULL rows, healthy and variant rows flow with
    corrupt=false, and the stream keeps going."""
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_triage_census,
        media_triage_ingest_start,
    )

    bad_png = bytearray(MM.make_png(1, 4, 3))
    bad_png[-20] ^= 0x55  # chunk CRC mismatch
    rows = [
        (0, bytearray(MM.make_png(0, 4, 3))),            # healthy
        (1, bad_png),                                    # corrupt -> flag
        (2, bytearray(MM.make_wav(2, 600))[:40]),        # truncated -> flag
        (3, bytearray(MM.make_wav_stereo(3, 80))),       # variant -> NULLs
        # review r11: non-ValueError corruption (mid-LZW truncation
        # raises IndexError) must quarantine identically
        (4, bytearray(MM.make_gif(2, 6, 5))[:791]),
    ]
    in_dir, census_dir, ckpt = (str(tmp_path / n) for n in ("in", "census", "ckpt"))
    spark.createDataFrame(rows, "media_id long, payload binary").coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    q = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    got = {r["media_id"]: r for r in media_triage_census(spark, census_dir).collect()}
    assert len(got) == 5
    assert got[0]["corrupt"] is False and got[0]["content_sum"] is not None
    for mid, mt in ((1, "image/png"), (2, "audio/wav"), (4, "image/gif")):
        r = got[mid]
        assert r["mtype"] == mt and r["corrupt"] is True
        assert (r["width"], r["height"], r["n_samples"], r["content_sum"]) == (
            None, None, None, None,
        ), r
    # unsupported variant is a boundary, not corruption
    assert got[3]["corrupt"] is False and got[3]["content_sum"] is None


def test_media_triage_census_reads_pre_upgrade_partitions(spark, tmp_path):
    """Schema evolution (review r11): a census directory holding a
    PRE-quarantine 6-column partition (written before `corrupt` existed)
    next to a post-upgrade 7-column one must read deterministically as
    the union — plain spark.read samples ONE footer, so whether the
    column existed depended on which file it picked. Old rows surface
    corrupt=NULL (predates the flag), new rows carry real flags; the
    compaction path preserves the column when rewriting mixed history."""
    import pyspark.sql.functions as F

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_triage_census,
        media_triage_compact,
        media_triage_ingest_start,
    )

    census_dir = str(tmp_path / "census")
    # simulate the pre-upgrade release: a landed batch WITHOUT `corrupt`
    old = MM.decode_dispatch_features(
        spark.createDataFrame(
            [(100, bytearray(MM.make_png(0, 4, 3)))],
            "media_id long, payload binary",
        ).withColumn("mtype", MM.sniff_media_type(F.col("payload")))
    ).withColumn("__batch_id", F.lit(5))  # NOT 0: the stream's first
    # micro-batch is id 0 and a colliding partition would be dynamically
    # overwritten — the real pre-upgrade shape is older ids next to new
    old.write.partitionBy("__batch_id").mode("append").parquet(census_dir)
    # post-upgrade stream lands a quarantine-schema batch beside it
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(200, bytearray(MM.make_png(1, 5, 4)))], "media_id long, payload binary"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    try:
        q.processAllAvailable()
        assert q.exception() is None
    finally:
        q.stop()
    census = media_triage_census(spark, census_dir)
    assert "corrupt" in census.columns
    got = {r["media_id"]: r for r in census.collect()}
    assert len(got) == 2
    assert got[100]["corrupt"] is None and got[100]["content_sum"] is not None
    assert got[200]["corrupt"] is False and got[200]["content_sum"] is not None
    # compacting the mixed history keeps the union schema and the rows
    media_triage_compact(spark, census_dir, upto_batch=2)
    after = {r["media_id"]: r for r in media_triage_census(spark, census_dir).collect()}
    assert {k: (v["corrupt"], v["content_sum"]) for k, v in after.items()} == {
        k: (v["corrupt"], v["content_sum"]) for k, v in got.items()
    }


def test_media_triage_compact_preserves_census(spark, tmp_path):
    """Census compaction: folding the committed per-batch partitions into
    one changes nothing a reader sees (same rows), shrinks the partition
    count, and a later micro-batch still lands beside the compacted
    history."""
    import pathlib

    import pyspark.sql.functions as F

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.streaming.compose import (
        media_triage_census,
        media_triage_compact,
        media_triage_ingest_start,
    )

    def drop(lo: int, hi: int):
        return spark.createDataFrame(
            [(i, bytearray(MM.make_png(i, 4 + i % 5, 3 + i % 4))) for i in range(lo, hi)],
            "media_id long, payload binary",
        )

    in_dir, census_dir, ckpt = (str(tmp_path / n) for n in ("in", "census", "ckpt"))
    for lo, hi in ((0, 6), (6, 12), (12, 18)):
        drop(lo, hi).coalesce(1).write.mode("append").parquet(in_dir)
        q = media_triage_ingest_start(
            spark, in_dir, census_dir, ckpt, max_files_per_trigger=1
        )
        q.processAllAvailable()
        q.stop()

    before = sorted(
        (r["media_id"], r["content_sum"])
        for r in media_triage_census(spark, census_dir).collect()
    )
    n_parts = len(list(pathlib.Path(census_dir).glob("__batch_id=*")))
    assert n_parts >= 3
    media_triage_compact(spark, census_dir, upto_batch=3)
    after = sorted(
        (r["media_id"], r["content_sum"])
        for r in media_triage_census(spark, census_dir).collect()
    )
    assert after == before
    assert len(list(pathlib.Path(census_dir).glob("__batch_id=*"))) == 1
    # a later batch lands beside the compacted history
    drop(18, 24).coalesce(1).write.mode("append").parquet(in_dir)
    q = media_triage_ingest_start(spark, in_dir, census_dir, ckpt)
    q.processAllAvailable()
    q.stop()
    assert media_triage_census(spark, census_dir).count() == 24
