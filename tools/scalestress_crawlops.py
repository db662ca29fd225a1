"""Million-row scale probes for the crawl-suite operators added in the
round-8 continuation: Bloom filter build + frontier probe, the
politeness window, and the host-rank edge pipeline. These are the ops
whose 100 TB story is structural (bounded filter, broadcast probes, one
host shuffle), so the probe checks the structure holds when the row
counts stop being toy-sized: build wall should scale with history, the
probe with frontier, and the filter size with NEITHER.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_CPUS=16 python tools/scalestress_crawlops.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import Window, functions as F

    from query_engine_spark.llmdata.warc import (
        build_bloom,
        frontier_not_seen,
        outlink_edges,
    )
    from query_engine_spark.session import get_spark

    spark = get_spark("scalestress_crawlops")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    def urls(n: int):
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"), (F.col("id") % 9973).cast("string"),
                F.lit(".example/p/"), F.col("id").cast("string"),
            ).alias("url")
        )

    # Bloom: build scales with history, probe with frontier, the filter
    # with neither (m_bits fixed)
    m_bits = 1 << 22  # 4M bits: ~0.5M entries at k=3 under 10% fill
    for hist_n, cand_n, label in ((250_000, 500_000, "large"),
                                  (1_000_000, 2_000_000, "xlarge")):
        hist = urls(hist_n).persist()
        hist.count()
        t0 = time.time()
        bloom = build_bloom(hist, m_bits=m_bits, k=3).persist()
        words = bloom.count()
        build_wall = time.time() - t0
        cand = urls(cand_n).persist()
        cand.count()
        t0 = time.time()
        frontier_not_seen(cand, bloom, m_bits=m_bits, k=3).write.format(
            "noop"
        ).mode("overwrite").save()
        probe_wall = time.time() - t0
        out[f"bloom_{label}"] = {
            "history": hist_n, "frontier": cand_n,
            "filter_words": words,
            "build_sec": round(build_wall, 2),
            "probe_sec": round(probe_wall, 2),
        }
        print(json.dumps({f"bloom_{label}": out[f"bloom_{label}"]}), flush=True)
        hist.unpersist(); bloom.unpersist(); cand.unpersist()

    # politeness window: one host-partitioned shuffle over N rows
    for n, label in ((500_000, "large"), (2_000_000, "xlarge")):
        fr = urls(n).select(
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"), "url"
        ).persist()
        fr.count()
        t0 = time.time()
        rn = F.row_number().over(Window.partitionBy("host").orderBy("url"))
        fr.select("host", "url", ((rn - 1).cast("long") * 1000).alias("off")).write.format(
            "noop"
        ).mode("overwrite").save()
        out[f"politeness_{label}"] = {
            "rows": n, "wall_sec": round(time.time() - t0, 2)
        }
        print(json.dumps({f"politeness_{label}": out[f"politeness_{label}"]}), flush=True)
        fr.unpersist()

    # host-rank front half: outlink extraction + distinct edges at scale
    for n, label in ((50_000, "large"), (200_000, "xlarge")):
        pages = spark.range(n).select(
            F.concat(
                F.lit("https://h"), (F.col("id") % 997).cast("string"),
                F.lit(".example/p/"), F.col("id").cast("string"),
            ).alias("url"),
            F.concat(
                F.lit('<html><body><a href="https://h'),
                ((F.col("id") * 3 + 1) % 997).cast("string"),
                F.lit('.example/x">a</a><a href="https://h'),
                ((F.col("id") * 7 + 2) % 997).cast("string"),
                F.lit('.example/y">b</a><p>'),
                F.lit("filler body text " * 20),
                F.lit("</p></body></html>"),
            ).alias("html"),
        ).persist()
        pages.count()
        t0 = time.time()
        (
            outlink_edges(pages)
            .select(F.col("src_host").alias("src"), F.col("dst_host").alias("dst"))
            .distinct()
            .write.format("noop").mode("overwrite").save()
        )
        out[f"edges_{label}"] = {
            "pages": n, "wall_sec": round(time.time() - t0, 2)
        }
        print(json.dumps({f"edges_{label}": out[f"edges_{label}"]}), flush=True)
        pages.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
