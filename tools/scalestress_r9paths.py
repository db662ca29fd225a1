"""4x-input scale probes for the round-9 candidate decode paths (round-8
addendum): RGB TIFF, packed sub-byte PNG, RLE8 BMP, multichannel /
extensible WAV and 24-bit FLAC — all map-only by construction (plan-
asserted in tests/test_plans.py), so the wall ratio at 4x input should
stay well under 4 while the session constant dominates, mirroring
tools/media_throughput.py's methodology (persisted input, warm noop
write timed).

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r9paths.py
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

    spark = get_spark("scalestress_r9paths")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    import pandas as pd

    def _rle8_run(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                w, h, isum, rsum, tl = MM.decode_bmp_rle8(bytes(blob))
                rows.append({
                    "media_id": mid, "width": w, "height": h,
                    "idx_sum": isum, "rgb_sum": rsum, "top_left_idx": tl,
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "idx_sum", "rgb_sum", "top_left_idx",
            ])

    def bmp_rle8_features(df):
        return df.mapInPandas(
            _rle8_run,
            "media_id long, width int, height int, idx_sum long, "
            "rgb_sum long, top_left_idx int",
        )

    probes = (
        ("tiff_rgb", lambda i: MM.make_tiff_rgb(
            i, 24, 18, compression=(1, 32773, 5)[i % 3],
            byte_order="II" if i % 2 == 0 else "MM"),
         MM.tiff_rgb_features),
        ("png_packed", lambda i: MM.make_png_packed(
            i, 32, 24, depth=(1, 2, 4)[i % 3],
            color_type=3 if i % 2 == 0 else 0, interlace=bool(i % 5 == 0)),
         MM.png_features),
        ("bmp_rle8", lambda i: MM.make_bmp_rle8(i, 48, 32), bmp_rle8_features),
        ("wav_extensible", lambda i: MM.make_wav_extensible(i, 800, channels=6),
         MM.wav_multich_features),
        ("flac24", lambda i: MM.make_flac24(i, 1000, 16000),
         MM.flac_features),
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
