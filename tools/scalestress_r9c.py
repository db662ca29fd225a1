"""4x-input scale probes for the THIRD round-9 candidate batch: PDF 1.5
xref/object-stream extraction, the MPEG audio frame walk, and the HTML
outlink graph. The decode/metadata paths are map-only by construction
(plan-asserted in tests/test_plans.py); the outlink path carries exactly
one shuffle (the edge-count groupBy) whose payload is host-pair strings,
tiny next to the scanned HTML — all expected near-linear.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_r9c.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import pdftext as PD
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_r9c")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    def make_pdf15_fixture(i: int) -> bytes:
        return PD.build_pdf_15(
            [[f"Doc {i} line {j}" for j in range(8)] for _ in range(1 + i % 3)],
            predictor=i % 2 == 0,
        )

    from query_engine_spark.llmdata import webp as WB

    media_probes = (
        ("pdf15_xrefstream", make_pdf15_fixture, PD.pdf_text_features),
        ("mp3_frame_walk", MM.make_mpeg_audio, MM.mpeg_audio_meta),
        (
            "webp_lossless",
            lambda i: WB.make_webp(i, 9 + i % 4, 8 + i % 3),
            WB.webp_features,
        ),
        ("webp_animated", WB.make_webp_animated, WB.webp_anim_features),
        ("pnm", lambda i: MM.make_pnm(i, 7 + i % 4, 5 + i % 3), MM.pnm_features),
        ("svg_meta", MM.make_svg, MM.svg_features),
        ("au_audio", lambda i: MM.make_au(i, 400 + i % 5 * 60), MM.au_features),
        ("woff_fonts", MM.make_woff, MM.woff_features),
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

    # outlink graph: HTML scan + one edge-count shuffle
    from pyspark.sql import functions as F

    from query_engine_spark.llmdata.warc import outlink_edges

    for label, n_docs in (("warmup", 64), ("large", 8192), ("xlarge", 32768)):
        rows = [
            (
                f"https://dom{d % 97}.example/p/{d}",
                "<html><body>"
                + "".join(
                    f'<a href="https://dom{(d + k) % 97}.example/x/{k}">l</a>'
                    f"<a href='/local/{k}'>b</a><p>filler text {k} </p>"
                    for k in range(12)
                )
                + "</body></html>",
            )
            for d in range(n_docs)
        ]
        in_bytes = sum(len(h) for _, h in rows)
        docs = (
            spark.createDataFrame(rows, "url string, html string")
            .repartition(spark.sparkContext.defaultParallelism)
            .persist()
        )
        docs.count()
        t0 = time.time()
        outlink_edges(docs).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        docs.unpersist()
        if label == "warmup":
            continue
        out[f"html_outlinks_{label}"] = {
            "docs": n_docs,
            "input_mb": round(in_bytes / 1e6, 1),
            "wall_sec": round(wall, 2),
            "mb_per_sec": round(in_bytes / 1e6 / wall, 2),
        }
        print(
            json.dumps({f"html_outlinks_{label}": out[f"html_outlinks_{label}"]}),
            flush=True,
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
