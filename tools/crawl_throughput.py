"""Crawl-ingest throughput probe (round 7): WARC bytes → response docs →
HTML→text → canonical-URL dedup keys, measured end to end on local[N].

The path is map-only by construction (warc_documents is one Arrow
mapInPandas pass; html_to_text / canonical_url are codegen'd column
expressions), so throughput should scale linearly with cores and input
size — this tool records the constant: MB of WARC input per second and
documents per second, at two input sizes to confirm the linear shape.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=32 python tools/crawl_throughput.py

Prints one JSON line; the round report references it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fixture_warc(wid: int, n_pages: int) -> bytes:
    from query_engine_spark.llmdata.warc import make_warc

    recs = [{"type": "warcinfo", "body": b"software: probe\r\n"}]
    for i in range(n_pages):
        url = f"HTTP://Site{wid % 50}.Example:80/p/{i}?utm_source=x&id={i}"
        body = (
            "<html><head><title>Page</title><style>p{}</style></head><body>"
            + f"<h1>Doc {wid}-{i}</h1>"
            + "".join(
                f"<p>sentence {k} of page {wid} {i} with several filler "
                f"words &amp; entities &#8212; here</p>"
                for k in range(25)
            )
            + "<script>var x = 1 < 2;</script></body></html>"
        ).encode()
        recs.append({"type": "request", "target_uri": url, "body": b"GET /\r\n"})
        recs.append({
            "type": "response", "target_uri": url,
            "content_type": "text/html; charset=utf-8", "body": body,
        })
    return make_warc(recs)


def main() -> None:
    from pyspark.sql import functions as F

    from query_engine_spark.llmdata.warc import (
        canonical_url, html_to_text, warc_documents,
    )
    from query_engine_spark.session import get_spark

    spark = get_spark("crawl_throughput")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    # warmup pass first: the initial Spark action pays 3-8 s of JIT that
    # would otherwise be billed to the first measurement
    for label, n_files, pages in (
        ("warmup", 8, 10), ("small", 64, 40), ("large", 256, 40),
    ):
        blobs = [(w, bytearray(_fixture_warc(w, pages))) for w in range(n_files)]
        in_bytes = sum(len(b) for _, b in blobs)
        df = spark.createDataFrame(blobs, "warc_id long, payload binary").repartition(
            spark.sparkContext.defaultParallelism
        ).persist()
        df.count()  # materialize input before the clock starts
        t0 = time.time()
        docs = warc_documents(df).select(
            canonical_url(F.col("url")).alias("key"),
            html_to_text(F.col("text")).alias("text"),
        )
        docs.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        df.unpersist()
        if label == "warmup":
            continue
        out[label] = {
            "warc_files": n_files,
            "input_mb": round(in_bytes / 1e6, 1),
            "docs": n_files * pages,
            "wall_sec": round(wall, 2),
            "mb_per_sec": round(in_bytes / 1e6 / wall, 1),
            "docs_per_sec": round(n_files * pages / wall),
        }
        print(json.dumps({label: out[label]}), flush=True)
    ratio = out["large"]["wall_sec"] / max(out["small"]["wall_sec"], 1e-9)
    print(json.dumps({"results": out, "wall_ratio_for_4x_input": round(ratio, 2)}))


if __name__ == "__main__":
    main()
