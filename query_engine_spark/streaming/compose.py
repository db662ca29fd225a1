"""Composed end-to-end streaming ingest job (SURVEY §2.10 / §3 EP3).

The pieces in `streaming/ingest.py` are each stream==batch tested in
isolation; this module wires them into ONE Structured Streaming query —
the reference's full ingest loop (page → overlap-dedup → count-view merge
→ serve trending; /root/reference/src/main.rs:328-464, 3143-3285) as a
single declarative plan:

    readStream(parquet dir)                      -- the "firehose" page source
      -> withWatermark(ts).dropDuplicatesWithinWatermark(id)
                                                 -- overlap dedup, state bounded
                                                    by the watermark horizon
                                                    (main.rs:3195-3209 rephrased
                                                    in event time)
      -> groupBy(window(ts), event_type).count/sum
                                                 -- incremental windowed count
                                                    view (main.rs:353-443)
      -> writeStream parquet sink + checkpoint   -- exactly-once, resumable

Two stateful operators chained in one query (dedup -> time-window agg) is
the Spark 3.4+ multiple-stateful-operator path; append mode + the shared
event-time watermark make both states evictable, so the job runs forever on
an unbounded source. The parquet sink + checkpoint give exactly-once
output across restarts — the test kills the query mid-stream, starts a new
one on the same checkpoint, and the final output still equals the batch
answer computed on the deduped union of all input files.

At 100 TB scale nothing changes: the file source lists new objects per
micro-batch, state is per-key (id hash, window×event_type) and
watermark-bounded, and the sink appends day-partitionable parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

__all__ = [
    "composed_ingest_start",
    "composed_ingest_result",
    "composed_batch_answer",
    "media_ingest_start",
    "media_ingest_matches",
    "media_index_compact",
]


def _plan(src: DataFrame, *, window: str, watermark: str) -> DataFrame:
    deduped = src.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["id"])
    return (
        deduped.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def composed_ingest_start(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "id long, user_id long, event_type string, value double, ts timestamp",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the composed job; returns the live StreamingQuery.

    Append mode: a window row is emitted exactly once, when the watermark
    passes its end — so the LAST windows only flush after an event beyond
    (max window end + watermark) arrives. Bounded replays (tests, backfills)
    append a sentinel event past the horizon to drain them; an unbounded
    production source advances the watermark on its own.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(input_dir)
    out = _plan(src, window=window, watermark=watermark)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def composed_ingest_result(spark: SparkSession, output_dir: str) -> DataFrame:
    """Read the sink back as a batch DataFrame (what a serving layer scans)."""
    return spark.read.parquet(output_dir)


def media_ingest_start(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    matches_dir: str,
    checkpoint_dir: str,
    *,
    schema: str = "media_id long, payload binary",
    max_hamming: int = 3,
    hasher=None,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Crawl-media ingest with INCREMENTAL perceptual dedup — the streaming
    form of the batch `media_incremental_dedup` shape (VERDICT r6 item 6),
    mirroring what `composed_ingest_start` does for exact event dedup:

        readStream(media parquet)                -- crawl batches of (id, payload)
          -> foreachBatch:
               dHash the batch                   -- map-only Arrow pass; only the
                                                    8-byte fingerprint leaves the
                                                    executor, never the pixels
               probe the band index              -- band-pigeonhole equi-join
                                                    against HISTORY ONLY: each
                                                    batch pays O(batch) hashing,
                                                    never O(history), and history
                                                    is never re-hashed
               append matches + own bands        -- both sinks partitioned by
                                                    batch id

    Exactly-once across restarts without a transactional sink: every write
    is a DYNAMIC partition overwrite keyed by the micro-batch id, and the
    probe filters the index to partitions with __batch_id < current — so a
    replayed batch overwrites its own partitions with identical content
    and can never see its own (or a later) batch in the index. `hasher`
    defaults to the BMP dHash pass (`multimodal.dhash_bands`); pass
    `multimodal.jpeg_dhash_bands` for a compressed crawl. At 100 TB the
    index is a parquet band table that compacts like any other — the probe
    join stays band-keyed and the per-batch cost stays O(batch)."""
    from pyspark.sql.utils import AnalysisException

    from query_engine_spark.llmdata import multimodal as MM

    do_hash = hasher if hasher is not None else MM.dhash_bands

    def _process(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        bands = do_hash(batch).persist()
        try:
            try:
                index = ss.read.parquet(index_dir).filter(
                    F.col("__batch_id") < F.lit(batch_id)
                )
                has_index = True
            except AnalysisException:
                has_index = False
            if has_index:
                matches = MM.perceptual_probe_pairs(
                    bands, index.drop("__batch_id"), max_hamming=max_hamming
                ).filter(F.col("media_id") != F.col("match_id"))
            else:
                matches = ss.createDataFrame(
                    [], "media_id long, match_id long, hamming long"
                )
            (
                matches.withColumn("__batch_id", F.lit(batch_id))
                .write.partitionBy("__batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(matches_dir)
            )
            (
                bands.withColumn("__batch_id", F.lit(batch_id))
                .write.partitionBy("__batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(index_dir)
            )
        finally:
            bands.unpersist()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(input_dir)
    return (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def media_index_compact(
    spark: SparkSession, index_dir: str, upto_batch: int, *, target_files: int = 1
) -> None:
    """Compact the band index's per-micro-batch partitions — the streaming
    small-file problem: a long-running crawl leaves one tiny parquet
    partition per batch, and the probe's scan cost becomes file-listing
    bound. Rewrites every partition with __batch_id < `upto_batch` into a
    single partition keyed `upto_batch - 1` with `target_files` files.

    Correctness: the probe filters __batch_id < current, so folding old
    partitions onto the HIGHEST compacted id changes no probe's visible
    set (any batch >= upto_batch still sees every compacted row; rows
    never move above a boundary a future probe could sit below). Safety:
    only compact batches the streaming checkpoint has committed —
    `upto_batch` must not exceed the last committed micro-batch + 1,
    because a replayed batch dynamic-overwrites its ORIGINAL partition,
    which must still exist to be idempotent. Committed batches never
    replay, so compacting behind the checkpoint is safe; the write below
    is itself a dynamic partition overwrite of exactly the partitions it
    read."""
    _compact_batch_partitions(spark, index_dir, upto_batch, target_files)


def media_triage_compact(
    spark: SparkSession, census_dir: str, upto_batch: int, *, target_files: int = 1
) -> None:
    """Compact the triage census's per-micro-batch partitions — the same
    small-file device as `media_index_compact` (census consumers drop
    __batch_id entirely, so folding old partitions onto the highest
    compacted id is trivially read-equivalent; the replay-idempotence
    constraint is identical: only compact batches the checkpoint has
    committed)."""
    _compact_batch_partitions(spark, census_dir, upto_batch, target_files)


def _compact_batch_partitions(
    spark: SparkSession, data_dir: str, upto_batch: int, target_files: int
) -> None:
    import pathlib
    import shutil

    from pyspark.sql.utils import AnalysisException

    try:
        # mergeSchema: compaction REWRITES history — sampling one footer
        # while the directory holds mixed schemas (the r11 census gained
        # `corrupt`) could silently bake the narrower schema into the
        # rewritten files, destroying the column for old rows
        index = spark.read.option("mergeSchema", "true").parquet(data_dir)
    except AnalysisException:
        return
    old = index.filter(F.col("__batch_id") < F.lit(upto_batch))
    if not old.take(1):
        return
    compacted = (
        old.withColumn("__batch_id", F.lit(upto_batch - 1))
        .repartition(target_files)
        .localCheckpoint()  # materialize BEFORE overwriting what we read
    )
    try:
        (
            compacted.write.partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(data_dir)
        )
    finally:
        compacted.unpersist()
    # dynamic overwrite only replaces the target partition; drop the other
    # now-duplicated source partitions explicitly
    for p in pathlib.Path(data_dir).glob("__batch_id=*"):
        try:
            bid = int(p.name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < upto_batch - 1:
            shutil.rmtree(p, ignore_errors=True)


def media_ingest_matches(spark: SparkSession, matches_dir: str) -> DataFrame:
    """Read the matches sink back as a batch DataFrame. A sink whose only
    batches produced zero matches holds no readable footer (an empty
    partitioned write commits just _SUCCESS), so that case comes back as
    an explicitly-empty frame with the sink's schema."""
    from pyspark.sql.utils import AnalysisException

    try:
        return spark.read.parquet(matches_dir).drop("__batch_id")
    except AnalysisException:
        return spark.createDataFrame([], "media_id long, match_id long, hamming long")


def composed_batch_answer(
    spark: SparkSession,
    events: DataFrame,
    *,
    window: str = "5 minutes",
) -> DataFrame:
    """The batch semantics the stream must match: dedup by id (first wins —
    order-insensitive on count/sum since duplicates share one payload), then
    tumbling-window counts."""
    return (
        events.dropDuplicates(["id"])
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
            "total",
        )
    )


def archive_ingest_start(
    spark: SparkSession,
    input_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    *,
    fmt: str = "zip",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Crawl-archive ingest: ZIP / TAR.GZ drops land in `input_dir` as
    (archive_id, payload) parquet; each micro-batch extracts every member
    document distributed (the map-only `archive_documents` pass — CRC /
    checksum verified, so a corrupt drop fails the batch loudly instead
    of landing wrong text) and writes (doc_id, text) to the corpus sink.

    Exactly-once across restarts without a transactional sink, the same
    device as `media_ingest_start`: every write is a DYNAMIC partition
    overwrite keyed by the micro-batch id, so a replayed batch overwrites
    its own partitions with identical content. At 100 TB the sink is a
    parquet table partitioned by ingest batch that compacts like any
    other; per-batch cost is O(batch) — archives are self-contained, so
    no history is ever re-read."""
    from query_engine_spark.llmdata import archives as AR

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            AR.archive_documents(batch, fmt=fmt)
            .withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(docs_dir)
        )

    reader = spark.readStream.schema("archive_id long, payload binary")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(input_dir)
    return (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def archive_ingest_docs(spark: SparkSession, docs_dir: str) -> DataFrame:
    """Read the landed corpus back without the ingest bookkeeping."""
    return spark.read.parquet(docs_dir).drop("__batch_id")


def outlink_ingest_start(
    spark: SparkSession,
    input_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Crawl-page outlink ingest: (url, html) page drops land in
    `input_dir` as parquet; each micro-batch runs the scan-speed
    `outlink_edges` extraction (llmdata/warc.py) and writes PARTIAL
    host-level edge counts to the edge sink, partitioned by micro-batch
    id with dynamic partition overwrite — so a replayed batch overwrites
    its own partitions with identical content (the same exactly-once
    device as the media and archive ingests).

    The accumulated graph is aggregate-on-read (`outlink_graph` sums the
    partials), which is the scalable shape: per-batch cost is O(batch
    pages), history is never re-read, and partial counts are associative
    so compaction can fold any subset of batches at any time without
    changing results."""
    from query_engine_spark.llmdata.warc import outlink_edges

    def _process(batch: DataFrame, batch_id: int) -> None:
        (
            outlink_edges(batch)
            .withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(edges_dir)
        )

    reader = spark.readStream.schema("url string, html string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(input_dir)
    return (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def outlink_graph(spark: SparkSession, edges_dir: str) -> DataFrame:
    """The accumulated host graph: per-batch partial edge counts summed
    across all landed ingest batches."""
    return (
        spark.read.parquet(edges_dir)
        .groupBy("src_host", "dst_host")
        .agg(F.sum("links").cast("long").alias("links"))
    )


def outlink_compact(
    spark: SparkSession, edges_dir: str, upto_batch: int, *, target_files: int = 1
) -> None:
    """Compact the outlink edge sink's per-micro-batch partitions AND
    pre-aggregate them: partial edge counts are associative, so every
    partition with __batch_id < `upto_batch` folds into ONE summed
    partition keyed `upto_batch - 1` — both the streaming small-file fix
    and a read-cost cut (the aggregate-on-read `outlink_graph` then sums
    far fewer rows). Same checkpoint-safety contract as
    `media_index_compact`: only compact batches the streaming checkpoint
    has committed, because a replayed batch dynamic-overwrites its
    ORIGINAL partition."""
    import pathlib
    import shutil

    from pyspark.sql.utils import AnalysisException

    try:
        edges = spark.read.parquet(edges_dir)
    except AnalysisException:
        return
    old = edges.filter(F.col("__batch_id") < F.lit(upto_batch))
    if not old.take(1):
        return
    compacted = (
        old.groupBy("src_host", "dst_host")
        .agg(F.sum("links").cast("long").alias("links"))
        .withColumn("__batch_id", F.lit(upto_batch - 1))
        .repartition(target_files)
        .localCheckpoint()  # materialize BEFORE overwriting what we read
    )
    try:
        (
            compacted.write.partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(edges_dir)
        )
    finally:
        compacted.unpersist()
    for p in pathlib.Path(edges_dir).glob("__batch_id=*"):
        try:
            bid = int(p.name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < upto_batch - 1:
            shutil.rmtree(p, ignore_errors=True)


def media_triage_ingest_start(
    spark: SparkSession,
    input_dir: str,
    census_dir: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Crawl-media TRIAGE ingest — the streaming form of the batch
    `media_decode_dispatch` shape: mixed media drops land in `input_dir`
    as (media_id, payload) parquet; each micro-batch sniffs every payload
    with the codegen magic-byte triage (`sniff_media_type`, a pure column
    expression) and routes it through the family decoders in one map-only
    Arrow pass (`decode_dispatch_features`), landing the unified census
    (dims + content sum / sample count / honest NULLs for unknown types).
    The dispatch runs in QUARANTINE mode (ADVICE r10): a corrupt-but-
    correctly-sniffed payload (CRC mismatch, truncated stream) lands a
    NULL row flagged `corrupt=true` instead of raising — a propagated
    error in foreachBatch never commits the batch, and the checkpoint
    restart replays the same poison forever. Unsupported in-family
    variants stay corrupt=false (a boundary, not bad bytes); the BATCH
    `media_decode_dispatch` census keeps the fail-loud default.

    Exactly-once across restarts without a transactional sink, the same
    device as the sibling ingests: every write is a DYNAMIC partition
    overwrite keyed by the micro-batch id, so a replayed batch overwrites
    its own partitions with identical content. Per-batch cost is O(batch)
    — triage never consults history; at 100 TB the census is a parquet
    table partitioned by ingest batch that compacts like any other."""
    from query_engine_spark.llmdata import multimodal as MM

    def _process(batch: DataFrame, batch_id: int) -> None:
        sniffed = batch.withColumn("mtype", MM.sniff_media_type(F.col("payload")))
        (
            MM.decode_dispatch_features(sniffed, quarantine=True)
            .withColumn("__batch_id", F.lit(batch_id))
            .write.partitionBy("__batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(census_dir)
        )

    reader = spark.readStream.schema("media_id long, payload binary")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    src = reader.parquet(input_dir)
    return (
        src.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def media_triage_census(spark: SparkSession, census_dir: str) -> DataFrame:
    """Read the landed census back without the ingest bookkeeping.

    mergeSchema: the census schema gained `corrupt` when quarantine mode
    landed (r11) — a directory holding pre-upgrade 6-column partitions
    next to new 7-column ones must read DETERMINISTICALLY as the union
    (plain spark.read samples one footer, so whether `corrupt` exists
    would depend on which file it picked). Pre-upgrade rows surface
    corrupt=NULL — honest "predates the flag", not an asserted false."""
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(census_dir)
        .drop("__batch_id")
    )
