"""Round-12 throughput probe: the round's hot-path change is the
decompression/pixel-bomb hardening (llmdata/bounds.py) landing ON the
decode happy paths — PNG IDAT now inflates through bounded_inflate with
a header-derived expected size, GIF LZW carries a per-entry output-cap
comparison in its innermost loop, JPEG/GIF/RLE8/QOI/VP8L gained a
dims-cap check per header, ZIP members inflate bounded by the
CD-declared size, and the dispatch quarantine's absorb set narrowed
from bare Exception to the named DISPATCH_CORRUPTION_EXC tuple.

Three probes, all conforming-payload (the caps must be free on the
happy path; the bomb tests prove they fire on adversarial bytes):

1. The dispatch census at the established r9/r10/r11 shape (16,384
   mixed payloads, 10 corpus classes, both postures) — costs the
   per-decode cap checks + the narrowed except tuple.
   r10: batch 0.581 s; r11: batch 0.620 s / quarantine 0.666 s.
2. ZIP ingest (read_zip over 256 archives x 16 deflated members)
   — costs the bounded member inflate (decompressobj + drain loop vs
   the old one-shot zlib.decompress).
3. GIF-frame + PNG decode over 4,096 payloads each — the two decoders
   whose inner loops changed most (LZW per-entry cap; IDAT
   expected-size inflate).

Usage: PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from query_engine_spark.llmdata import archives as AR
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import webp as WB
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_r12")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- probe 1: dispatch census, the established shape ---------------
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

    # --- probe 2: ZIP ingest (bounded member inflate) -------------------
    def one_zip(a: int) -> bytes:
        # 16 compressible text members per archive, llm_zip_ingest's shape
        members = [
            (f"doc{a * 16 + k}.txt",
             (f"document {a * 16 + k} " * (40 + k % 17)).encode())
            for k in range(16)
        ]
        return AR.build_zip(members)

    for label, n_arch in (("warmup", 16), ("large", 64), ("xlarge", 256)):
        blobs = [(a, bytearray(one_zip(a))) for a in range(n_arch)]
        in_bytes = sum(len(b) for _, b in blobs)
        df = (
            spark.createDataFrame(blobs, "archive_id long, payload binary")
            .repartition(spark.sparkContext.defaultParallelism)
            .persist()
        )
        df.count()
        t0 = time.time()
        AR.archive_members(df, fmt="zip").write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.time() - t0
        df.unpersist()
        if label == "warmup":
            continue
        out[f"zip_ingest_{label}"] = {
            "archives": n_arch,
            "members": n_arch * 16,
            "input_mb": round(in_bytes / 1e6, 1),
            "wall_sec": round(wall, 3),
            "members_per_sec": round(n_arch * 16 / wall),
        }
        print(json.dumps({f"zip_ingest_{label}": out[f"zip_ingest_{label}"]}),
              flush=True)

    # --- probe 3: the two most-changed image decoders -------------------
    for fam, maker, runner in (
        ("gif", lambda i: MM.make_gif(i, 28 + i % 5, 18 + i % 4),
         MM.gif_features),
        ("png", lambda i: MM.make_png(i, 4 + i % 5, 3 + i % 4),
         MM.png_features),
    ):
        for label, n_media in (("warmup", 64), ("large", 1024),
                               ("xlarge", 4096)):
            blobs = [(m, bytearray(maker(m))) for m in range(n_media)]
            df = (
                spark.createDataFrame(blobs, "media_id long, payload binary")
                .repartition(spark.sparkContext.defaultParallelism)
                .persist()
            )
            df.count()
            t0 = time.time()
            runner(df).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            df.unpersist()
            if label == "warmup":
                continue
            out[f"{fam}_decode_{label}"] = {
                "media": n_media,
                "wall_sec": round(wall, 3),
                "payloads_per_sec": round(n_media / wall),
            }
            print(json.dumps({f"{fam}_decode_{label}":
                              out[f"{fam}_decode_{label}"]}), flush=True)

    ratios = {
        k.rsplit("_", 1)[0]: round(
            out[k]["wall_sec"]
            / max(out[k.replace("xlarge", "large")]["wall_sec"], 1e-9),
            2,
        )
        for k in out if k.endswith("_xlarge")
    }
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": ratios}))


if __name__ == "__main__":
    main()
