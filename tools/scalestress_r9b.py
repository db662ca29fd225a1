"""4x-input scale probes for the SECOND round-9 candidate batch (built in
the round-8 continuation session): EXIF metadata / orientation-aware JPEG
decode, Adobe CMYK JPEG, ID3v2 metadata, and the ZIP / TAR.GZ archive
ingestion roundtrips. The decode/metadata paths are map-only by
construction (plan-asserted in tests/test_plans.py), so wall at 4x input
should grow well under 4x while the session constant dominates; the
archive paths carry exactly one shuffle (the groupBy(archive_id) pack),
whose payload is the bounded archive bytes — also expected near-linear.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r9b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from query_engine_spark.llmdata import archives as AR
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_r9b")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    media_probes = (
        ("exif_metadata", lambda i: MM.make_jpeg_exif(i, 4, 4), MM.exif_metadata),
        ("jpeg_oriented", lambda i: MM.make_jpeg_exif(i, 4, 4), MM.jpeg_oriented_features),
        ("jpeg_cmyk", lambda i: MM.make_jpeg_cmyk(i, 4, 4), MM.jpeg_cmyk_features),
        ("id3_metadata", MM.make_mp3_id3, MM.id3_metadata),
    )

    for path, maker, feats in media_probes:
        for label, n_media in (("warmup", 16), ("large", 1024), ("xlarge", 4096)):
            blobs = [(m, bytearray(maker(m))) for m in range(n_media)]
            in_bytes = sum(len(b) for _, b in blobs)
            df = (
                spark.createDataFrame(blobs, "media_id long, payload binary")
                .repartition(spark.sparkContext.defaultParallelism)
                .persist()
            )
            df.count()
            t0 = time.time()
            feats(df).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            df.unpersist()
            if label == "warmup":
                continue
            out[f"{path}_{label}"] = {
                "media": n_media,
                "input_mb": round(in_bytes / 1e6, 1),
                "wall_sec": round(wall, 2),
                "mb_per_sec": round(in_bytes / 1e6 / wall, 2),
            }
            print(json.dumps({f"{path}_{label}": out[f"{path}_{label}"]}), flush=True)

    # archive roundtrips: docs -> pack (one shuffle) -> extract (map-only)
    for fmt, path in (("zip", "zip_ingest"), ("tar.gz", "tar_ingest")):
        for label, n_docs in (("warmup", 64), ("large", 4096), ("xlarge", 16384)):
            rows = [(d, f"doc {d} body " * 40) for d in range(n_docs)]
            in_bytes = sum(len(t) for _, t in rows)
            docs = (
                spark.createDataFrame(rows, "doc_id long, text string")
                .repartition(spark.sparkContext.defaultParallelism)
                .persist()
            )
            docs.count()
            t0 = time.time()
            AR.archive_members(
                AR.pack_archives(docs, fmt=fmt, group_size=8), fmt=fmt
            ).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            docs.unpersist()
            if label == "warmup":
                continue
            out[f"{path}_{label}"] = {
                "docs": n_docs,
                "input_mb": round(in_bytes / 1e6, 1),
                "wall_sec": round(wall, 2),
                "mb_per_sec": round(in_bytes / 1e6 / wall, 2),
            }
            print(json.dumps({f"{path}_{label}": out[f"{path}_{label}"]}), flush=True)

    ratios = {
        path: round(
            out[f"{path}_xlarge"]["wall_sec"]
            / max(out[f"{path}_large"]["wall_sec"], 1e-9),
            2,
        )
        for path in (
            "exif_metadata", "jpeg_oriented", "jpeg_cmyk", "id3_metadata",
            "zip_ingest", "tar_ingest",
        )
    }
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": ratios}))


if __name__ == "__main__":
    main()
