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

__all__ = ["composed_ingest_start", "composed_ingest_result", "composed_batch_answer"]


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
