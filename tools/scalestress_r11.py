"""Round-11 throughput probe: the one hot-path rewrite this round is
`decode_dispatch_features`' quarantine restructure (per-row corrupt flag
+ broadened exception absorption). Re-measure the dispatch census at the
r9/r10 measurement's shape — 16,384 mixed payloads over the 10 corpus
classes including the undecodable-lossy-WebP NULL path and unknown bytes
— in BOTH postures: quarantine=False (the registered batch query,
byte-identical output to r10) and quarantine=True (the streaming triage
path, +1 boolean column). r10 recorded 0.581 s ≈ 28,216 payloads/s for
the batch posture at local[16].

Usage: PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r11.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import webp as WB
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_r11")
    spark.sparkContext.setLogLevel("ERROR")

    def mixed(i: int) -> bytes:
        sel = i % 10
        if sel == 0:
            return MM.make_jpeg(i, 2 + i % 2, 2 + (i // 2) % 2)
        if sel == 1:
            return MM.make_png(i, 4 + i % 5, 3 + i % 4)
        if sel == 2:
            return MM.make_gif(i, 28 + i % 5, 18 + i % 4)
        if sel == 3:
            return WB.make_webp(i, 9 + i % 4, 8 + i % 3)
        if sel == 4:
            return MM.make_wav(i, 600 + (i % 7) * 100)
        if sel == 5:
            return MM.make_tiff(i, 9 + i % 4, 8 + i % 3)
        if sel == 6:
            return MM.make_bmp(i, 4 + i % 5, 3 + i % 4)
        if sel == 7:
            return WB.make_webp_lossy(i, 16 + i % 13, 16 + i % 9)  # NULL path
        if sel == 8:
            return MM.make_jpeg_color(i, 2, 2)
        return bytes((i * 7 + k) % 251 + 1 for k in range(24))  # unknown

    out: dict = {}
    for label, n_media in (("warmup", 64), ("large", 4096), ("xlarge", 16384)):
        blobs = [(m, bytearray(mixed(m))) for m in range(n_media)]
        in_bytes = sum(len(b) for _, b in blobs)
        df = (
            spark.createDataFrame(blobs, "media_id long, payload binary")
            .repartition(spark.sparkContext.defaultParallelism)
            .persist()
        )
        df.count()
        sniffed = df.withColumn("mtype", MM.sniff_media_type(F.col("payload")))
        for posture, kw in (("batch", False), ("quarantine", True)):
            t0 = time.time()
            MM.decode_dispatch_features(sniffed, quarantine=kw).write.format(
                "noop"
            ).mode("overwrite").save()
            wall = time.time() - t0
            if label == "warmup":
                continue
            out[f"dispatch_{posture}_{label}"] = {
                "media": n_media,
                "input_mb": round(in_bytes / 1e6, 1),
                "wall_sec": round(wall, 3),
                "payloads_per_sec": round(n_media / wall),
            }
            print(
                json.dumps({f"dispatch_{posture}_{label}":
                            out[f"dispatch_{posture}_{label}"]}),
                flush=True,
            )
        df.unpersist()
    ratios = {
        f"dispatch_{p}": round(
            out[f"dispatch_{p}_xlarge"]["wall_sec"]
            / max(out[f"dispatch_{p}_large"]["wall_sec"], 1e-9),
            2,
        )
        for p in ("batch", "quarantine")
    }
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": ratios}))


if __name__ == "__main__":
    main()
