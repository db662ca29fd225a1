"""A/B throughput probe for the r16 HTML fix bundle (opener pre-pass +
document-order metadata): the four extractor chains, OLD (given module
path, e.g. HEAD's warc.py) vs NEW (the working tree), on a realistic
generated corpus, min-of-3 noop-write timings per cell — the r15
min-fold methodology.

Usage:
    PYTHONPATH=/root/repo python tools/r16_extractor_ab.py /tmp/oldmod/warc_old.py [n_pages]
"""

from __future__ import annotations

import importlib.util
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    old_path = sys.argv[1]
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

    import test_html_differential as H
    from pyspark.sql import functions as F
    from query_engine_spark.llmdata import warc as NEW
    from query_engine_spark.session import get_spark

    OLD = _load(old_path, "warc_old")
    spark = get_spark("r16_extractor_ab")
    spark.sparkContext.setLogLevel("ERROR")

    pages = []
    for seed in range(n_pages):
        g = H._PageGen(random.Random(50_000 + seed))
        pages.append((f"https://s{seed % 31}.example/d{seed % 7}/p{seed}.html",
                      g.page()))
    df = spark.createDataFrame(pages, "url string, html string").repartition(16)
    df.persist().count()

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    def meta_run(mod):
        m = mod.html_metadata(F.col("html"))
        return lambda: df.select(
            *[m[k].alias(k) for k in m]
        ).write.format("noop").mode("overwrite").save()

    def text_run(mod):
        return lambda: df.select(
            mod.html_to_text(F.col("html")).alias("t")
        ).write.format("noop").mode("overwrite").save()

    def links_run(mod):
        return lambda: mod.outlink_edges(df).write.format(
            "noop").mode("overwrite").save()

    def imgs_run(mod):
        return lambda: mod.image_refs(df).write.format(
            "noop").mode("overwrite").save()

    out = {"n_pages": n_pages, "cells": {}}
    for name, mk in [("metadata", meta_run), ("text", text_run),
                     ("outlinks", links_run), ("images", imgs_run)]:
        t_old = timed(mk(OLD))
        t_new = timed(mk(NEW))
        out["cells"][name] = {
            "old_s": t_old, "new_s": t_new,
            "ratio": round(t_new / t_old, 3) if t_old else None,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
