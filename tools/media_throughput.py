"""Compressed-media decode throughput probe (round 7 addendum): the new
container paths — MP4/MJPEG sample-table demux + per-frame baseline-JPEG
decode, and animated-GIF LZW frame decode — measured end to end on
local[N].

Both paths are map-only by construction (one Arrow mapInPandas pass per
payload; no shuffle exists anywhere before the first downstream join),
so throughput should scale linearly with cores and input size — this
tool records the constant (MB/s and frames/s) at two input sizes to
confirm the linear shape, mirroring tools/crawl_throughput.py.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=32 python tools/media_throughput.py

Prints one JSON line per point; the round report references it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.session import get_spark

    spark = get_spark("media_throughput")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    probes = (
        # (path label, maker, feature fn, frames per payload)
        ("mp4_mjpeg", lambda i: MM.make_mp4_mjpeg(i, 8),
         lambda df: MM.mp4_frame_features(df, every_n=1, max_frames=8), 8),
        ("gif_animated", lambda i: MM.make_gif_animated(i, 24, 18, 8),
         lambda df: MM.gif_frame_features(df, every_n=1, max_frames=8), 8),
    )
    for path, maker, feats, fpp in probes:
        # xlarge (r8): 2048 payloads so decode CPU dominates the session
        # constant (~0.2 s of scheduling noise swamps the 512-payload point
        # once the vectorized kernels push per-frame cost down ~10x)
        for label, n_media in (
            ("warmup", 16), ("small", 128), ("large", 512), ("xlarge", 2048),
        ):
            blobs = [(m, bytearray(maker(m))) for m in range(n_media)]
            in_bytes = sum(len(b) for _, b in blobs)
            df = (
                spark.createDataFrame(blobs, "media_id long, payload binary")
                .repartition(spark.sparkContext.defaultParallelism)
                .persist()
            )
            df.count()  # materialize input before the clock starts
            t0 = time.time()
            feats(df).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            df.unpersist()
            if label == "warmup":
                continue
            out[f"{path}_{label}"] = {
                "media": n_media,
                "input_mb": round(in_bytes / 1e6, 1),
                "frames": n_media * fpp,
                "wall_sec": round(wall, 2),
                "mb_per_sec": round(in_bytes / 1e6 / wall, 2),
                "frames_per_sec": round(n_media * fpp / wall),
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
