"""4x-input scale probes for round 9's new operator families: the WebP
metadata census (webp_meta_features over mixed VP8/VP8L/VP8X payloads)
and the sniff->decoder dispatch stage (codegen triage + one-pass family
routing). Both are map-only by construction (plan-asserted), so the wall
ratio at 4x input should stay well under 4 while the session constant
dominates — the same methodology as tools/scalestress_r9paths.py
(persisted input, warm noop write timed).

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r9new.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import webp as WB
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_r9new")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    def webp_mixed(i: int) -> bytes:
        sel = i % 3
        if sel == 0:
            return WB.make_webp_lossy(i, 16 + i % 13, 16 + i % 9)
        if sel == 1:
            return WB.make_webp(i, 9 + i % 4, 8 + i % 3)
        return WB.make_webp_animated(i)

    def dispatch_mixed(i: int) -> bytes:
        sel = i % 8
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
        return bytes((i * 7 + k) % 251 + 1 for k in range(24))

    def dispatch_feats(df):
        return MM.decode_dispatch_features(
            df.withColumn("mtype", MM.sniff_media_type(F.col("payload")))
        )

    probes = (
        ("webp_meta", webp_mixed, WB.webp_meta_features),
        ("decode_dispatch", dispatch_mixed, dispatch_feats),
    )

    for path, maker, feats in probes:
        for label, n_media in (("warmup", 16), ("large", 512), ("xlarge", 2048)):
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
    ratios = {
        path: round(
            out[f"{path}_xlarge"]["wall_sec"]
            / max(out[f"{path}_large"]["wall_sec"], 1e-9),
            2,
        )
        for path, *_ in probes
    }
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": ratios}))


if __name__ == "__main__":
    main()
