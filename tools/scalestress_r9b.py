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

    from query_engine_spark.llmdata import pdftext as PD
    from query_engine_spark.llmdata import warc as WC

    def make_pdf_fixture(i: int) -> bytes:
        return PD.build_pdf(
            [[f"Doc {i} line {j}" for j in range(8)] for _ in range(1 + i % 3)],
            compress=i % 2 == 0,
        )

    def sitemap_feats(df):
        return WC.sitemap_entries(
            df.withColumnRenamed("media_id", "site_id"), id_col="site_id"
        )

    from query_engine_spark.llmdata import ebooks as EB
    from query_engine_spark.llmdata import mail as ML
    from query_engine_spark.llmdata import multimodal as _MM

    def make_epub_fixture(i: int) -> bytes:
        return EB.make_epub(
            i, [(f"Ch {k}", [f"book {i} ch {k} para " * 8]) for k in range(3)]
        )

    def epub_feats(df):
        return EB.epub_features(
            df.withColumnRenamed("media_id", "book_id"), id_col="book_id"
        )

    def make_mbox_fixture(i: int) -> bytes:
        return ML.build_mbox(
            [
                ML.build_message(
                    from_addr=f"u{k}@d{(i + k) % 9}.example",
                    subject=f"Msg {k} of {i}",
                    body=f"Body {k} box {i}.\nFrom here on.\n" * 4,
                    html="twin" if k % 2 else None,
                    cte="base64" if k % 3 == 0 else "quoted-printable",
                )
                for k in range(3)
            ]
        )

    def mbox_feats(df):
        return ML.mbox_messages(
            df.withColumnRenamed("media_id", "box_id"), id_col="box_id"
        )

    def robots_feats(df):
        return WC.robots_decisions(
            df.withColumnRenamed("media_id", "site_id"), id_col="site_id"
        )

    media_probes = (
        ("exif_metadata", lambda i: MM.make_jpeg_exif(i, 4, 4), MM.exif_metadata),
        ("jpeg_oriented", lambda i: MM.make_jpeg_exif(i, 4, 4), MM.jpeg_oriented_features),
        ("jpeg_cmyk", lambda i: MM.make_jpeg_cmyk(i, 4, 4), MM.jpeg_cmyk_features),
        ("id3_metadata", MM.make_mp3_id3, MM.id3_metadata),
        ("pdf_text", make_pdf_fixture, PD.pdf_text_features),
        ("ico_decode", MM.make_ico, MM.ico_features),
        ("sitemap_frontier", lambda i: WC.make_sitemap(i, 10), sitemap_feats),
        ("epub_ingest", make_epub_fixture, epub_feats),
        ("mbox_ingest", make_mbox_fixture, mbox_feats),
        ("robots_gate", lambda i: WC.make_robots(i).encode(), robots_feats),
        ("subtitles", lambda i: _MM.make_subtitles(i, 8).encode(), _MM.subtitle_stats),
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

    # text-stage probes: map-only (nfc) and pure-codegen (jsonl) over docs
    from pyspark.sql import functions as F

    from query_engine_spark.llmdata import textstats as TS

    def nfc_stage(docs):
        return TS.nfc_normalize_features(
            docs.select(
                "doc_id",
                F.concat(F.lit("Café "), F.col("text")).alias("text"),
            )
        )

    def jsonl_stage(docs):
        lines = docs.select(F.to_json(F.struct("doc_id", "text")).alias("line"))
        parsed = lines.select(
            F.from_json("line", "doc_id long, text string").alias("r")
        ).select("r.doc_id", "r.text")
        return parsed.select(
            "doc_id", F.md5(F.encode("text", "utf-8")).alias("fp")
        )

    for path, stage in (("nfc_normalize", nfc_stage), ("jsonl_roundtrip", jsonl_stage)):
        for label, n_docs in (("warmup", 64), ("large", 8192), ("xlarge", 32768)):
            rows = [(d, f"doc {d} body " * 40) for d in range(n_docs)]
            in_bytes = sum(len(t) for _, t in rows)
            docs = (
                spark.createDataFrame(rows, "doc_id long, text string")
                .repartition(spark.sparkContext.defaultParallelism)
                .persist()
            )
            docs.count()
            t0 = time.time()
            stage(docs).write.format("noop").mode("overwrite").save()
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

    # archive roundtrips: docs -> pack (one shuffle) -> extract (map-only)
    for fmt, path in (
        ("zip", "zip_ingest"),
        ("tar.gz", "tar_ingest"),
        ("tar.mixed", "tar_mixed_ingest"),
    ):
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
            "pdf_text", "ico_decode", "sitemap_frontier",
            "epub_ingest", "mbox_ingest", "robots_gate", "subtitles",
            "nfc_normalize", "jsonl_roundtrip",
            "zip_ingest", "tar_ingest", "tar_mixed_ingest",
        )
    }
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": ratios}))


if __name__ == "__main__":
    main()
