"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed (a
deterministic fake or NotImplementedError) — but the Spark-side plumbing is
real and tested: schemas, Arrow-batched `mapInPandas` signatures, partition
shaping, and the metadata model. Swapping the stub for Pillow/torchaudio is a
one-function change; nothing about the distributed plan changes.

Scale notes: media rows are large (MBs) — `media_repartition` sizes
partitions by *bytes*, not rows, so an executor never materializes more than
`target_mb` of media per Arrow batch (`maxRecordsPerBatch` should be set low
for these frames in a real deployment).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "MEDIA_META_TYPE",
    "MEDIA_SCHEMA",
    "attach_media_meta",
    "media_repartition",
    "image_features",
    "frame_sample",
]

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # e.g. image/png, audio/wav
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META_TYPE),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str = "payload", media_type: str = "application/octet-stream") -> DataFrame:
    """Derive the typed metadata struct from an opaque binary column."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("size_bytes"),
        ),
    )


def media_repartition(df: DataFrame, target_mb: int = 128, payload_col: str = "payload") -> DataFrame:
    """Repartition so each partition holds ≈ target_mb of payload bytes.

    Media skew (one 4K video next to thumbnails) breaks row-count-based
    partitioning; byte-based sizing keeps Arrow batches bounded.

    Fully in-plan (no driver-side byte-count collect): the AQE REBALANCE
    hint sizes shuffle partitions by BYTES at runtime — merging small
    partitions and splitting oversized ones toward the advisory size — which
    is exactly byte-based repartitioning, decided from the actual shuffle
    statistics instead of a pre-pass aggregate. Note: the advisory size is a
    session-level AQE knob; it is set here and applies to subsequent adaptive
    coalescing in the session.
    """
    spark = df.sparkSession
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_mb * 1024 * 1024)
    )
    return df.hint("rebalance")


_FEATURE_SCHEMA = "media_id long, n_bytes long, byte_mean double, byte_hist array<int>"


def image_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    fake=True computes deterministic byte-level features (length, mean byte,
    16-bin byte histogram) standing in for a real decode; fake=False is where
    a real codec (Pillow etc.) plugs in — not available in this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real image decode needs a codec library (not in this container)")
            payloads = pdf["payload"]
            rows = []
            for mid, blob in zip(pdf["media_id"], payloads):
                b = bytes(blob) if blob is not None else b""
                hist = [0] * 16
                for byte in b:
                    hist[byte >> 4] += 1
                rows.append(
                    {
                        "media_id": mid,
                        "n_bytes": len(b),
                        "byte_mean": (sum(b) / len(b)) if b else 0.0,
                        "byte_hist": hist,
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "byte_mean", "byte_hist"])

    return df.select("media_id", "payload").mapInPandas(run, _FEATURE_SCHEMA)


_FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8, *, fake: bool = True) -> DataFrame:
    """Sample "frames" from a video payload (stub: fixed-stride byte slices).

    The real implementation would seek keyframes with a demuxer; the plumbing
    (one row in → N frame rows out via mapInPandas) is what's being tested.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame extraction needs a demuxer (not in this container)")
            out = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(blob) if blob is not None else b""
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out.append({"media_id": mid, "frame_idx": i, "frame_bytes": b[i * every_n_bytes : (i + 1) * every_n_bytes]})
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.select("media_id", "payload").mapInPandas(run, _FRAME_SCHEMA)
