"""Round-5 (session 3) targeted scale stress: the operators this session
added, measured at sf0.1 and at the structure-preserving 10x replica
(tools/scalestress_sf.build_dataset) in one session.

These are the registry queries verbatim (they aggregate, so no fixture cap
distorts the growth law):

- q2/q9/q11/q12/q20/q21: the remaining TPC-H shapes -> expect ~linear
  (broadcast dims scale 10x but stay dim-sized; the only big-big joins are
  keyed on orderkey/partkey which replicate disjointly)
- text_strip_boilerplate: one (source,prefix) shuffle + broadcast strip
  join -> ~linear
- text_doc_segment_dedup: map-only array expressions -> ~linear, zero
  shuffle at both scales
- events_anomaly_zscore: one key-partitioned bounded-frame window ->
  ~linear (state O(lookback) per key)

Usage: PYTHONPATH=/root/repo python tools/scalestress_s3ops.py [k] [out_dir]
Prints one JSON line; the SCALESTRESS_r05.md addendum is written from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"

OPS = [
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_value",
    "q12_priority_lines",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    "text_strip_boilerplate",
    "text_doc_segment_dedup",
    "events_anomaly_zscore",
    # late session-3 additions
    "events_anomaly_static",
    "llm_bpe_train",
    "events_cusum_drift",
    "media_audio_dedup",
    "llm_curation_pipeline",
]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from tools.scalestress_sf import build_dataset, total_shuffle_write

    spark = get_spark("scalestress_s3ops")
    spark.range(1).count()

    if not os.path.exists(os.path.join(out_dir, "events.parquet")):
        t0 = time.time()
        build_dataset(spark, k, out_dir)
        print(f"# built {k}x dataset at {out_dir} in {time.time() - t0:.0f}s", file=sys.stderr)

    def perceptual_full(spark, sf_dir):
        # the registry fixture caps at 64 ids for oracle determinism; the
        # stress form hashes EVERY document's (synthetic) image. The BMP
        # generator has only 256 distinct pixel bases, so duplicate classes
        # GROW with the corpus (10x docs -> 10x per class -> 100x true
        # pairs): exactly the hub-bucket hazard max_bucket exists for — the
        # production configuration caps the bucket, keeping the join linear
        # while the pathological classes are dropped, same as MinHash-LSH.
        from pyspark.sql import functions as F
        from query_engine_spark.llmdata import multimodal as MM
        from query_engine_spark.registry import _pack_media

        docs = registry.load_table(spark, sf_dir, "documents")
        ids = docs.select(F.col("doc_id").alias("media_id"))
        media = _pack_media(
            ids, lambda i: MM.make_bmp(i, 32 + i % 7, 24 + i % 5)
        )
        return MM.perceptual_dedup_pairs(
            MM.dhash_bands(media), max_hamming=3, max_bucket=50
        )

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", BASE), (f"sf1({k}x)", out_dir)):
        for name in OPS + ["media_perceptual_full"]:
            fn = (
                perceptual_full
                if name == "media_perceptual_full"
                else registry.REGISTRY[name].fn
            )
            best, shuffle_b, rows = None, None, None
            for _ in range(2):
                s0 = total_shuffle_write(spark)
                t0 = time.time()
                rows = fn(spark, sf_dir).count()
                dt = time.time() - t0
                sb = total_shuffle_write(spark) - s0
                if best is None or dt < best:
                    best, shuffle_b = dt, sb
            results.setdefault(name, {})[sf_name] = {
                "sec": round(best, 2),
                "shuffle_mb": round(shuffle_b / 1e6, 1),
                "rows": rows,
            }
    sf1_key = f"sf1({k}x)"
    for name, r in results.items():
        r["ratio"] = round(r[sf1_key]["sec"] / max(r["sf0.1"]["sec"], 1e-9), 1)
    print(json.dumps({"k": k, "ops": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
