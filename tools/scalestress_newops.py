"""Round-5 (session 2) targeted scale stress: the five operators this
session added, measured at sf0.1 and at the structure-preserving 10x
replica (tools/scalestress_sf.build_dataset) in one session.

Unlike the registry fixtures (which pin doc_id/vec_id caps for oracle
determinism), these runs cover the FULL table at each scale so the wall
ratio reflects the operator's growth law:

- hashed classifier (train + score): two corpus explodes + bucket-keyed
  agg + broadcast model join -> expect ~linear
- DSIR weights: two gram explodes + bucket aggs + broadcast ratio join
  -> ~linear
- winnowing fingerprints: position explode + one doc-keyed window +
  distinct -> ~linear
- PQ ADC top-k: trains codebooks + encodes + LUT-joins the full
  embeddings table -> ~linear (model-sized joins are broadcast)
- GIF decode: pack + LZW decode, map-only -> ~linear in media count

Usage: PYTHONPATH=/root/repo python tools/scalestress_newops.py [k] [out_dir]
Prints one JSON line; the SCALESTRESS_r05.md addendum is written from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"

    from pyspark.sql import functions as F

    from query_engine_spark.session import get_spark
    from query_engine_spark.llmdata import similarity as Sim
    from query_engine_spark.llmdata import textstats as Tx
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.sources.testdata import load_table
    from tools.scalestress_sf import build_dataset, total_shuffle_write

    spark = get_spark("scalestress_newops")
    spark.range(1).count()

    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.time()
        build_dataset(spark, k, out_dir)
        print(f"# built {k}x dataset at {out_dir} in {time.time() - t0:.0f}s", file=sys.stderr)

    def classifier(sf_dir: str):
        docs = load_table(spark, sf_dir, "documents")
        w = Tx.train_hashed_classifier(docs, F.col("lang") == "en")
        return Tx.hashed_classifier_score(docs, w, F.col("lang") == "en")

    def dsir(sf_dir: str):
        docs = load_table(spark, sf_dir, "documents")
        return Tx.dsir_weights(docs, docs.filter(F.col("lang") == "en"))

    def winnow(sf_dir: str):
        return Tx.winnow_fingerprints(load_table(spark, sf_dir, "documents"))

    def pq(sf_dir: str):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = (
            emb.orderBy("vec_id").limit(3)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        )
        return Sim.pq_adc_topk(emb, queries, k=5, m=4, ksub=4, iters=2)

    def gif(sf_dir: str):
        ids = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("media_id")
        )
        import pandas as _pd

        def pack(batches):
            for pdf in batches:
                yield _pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": [
                            MM.make_gif(int(i) % 997, 28 + int(i) % 5, 18 + int(i) % 4)
                            for i in pdf["media_id"]
                        ],
                    }
                )

        media = ids.mapInPandas(pack, "media_id long, payload binary")
        return MM.gif_features(media)

    def countmin(sf_dir: str):
        from query_engine_spark.operators import sketches as Sk

        ev = load_table(spark, sf_dir, "events")
        sketch = Sk.countmin_sketch(ev, "user_id", d=4, w=1024)
        items = ev.select("user_id").distinct()
        return Sk.countmin_estimate(sketch, items, "user_id", d=4, w=1024)

    def containment(sf_dir: str):
        from query_engine_spark.llmdata import dedup as D

        docs = load_table(spark, sf_dir, "documents")
        # max_df guard on: the production configuration for a full corpus
        return D.containment_pairs(docs, threshold=0.5, max_df=50)

    def ivfpq(sf_dir: str):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = (
            emb.orderBy("vec_id").limit(3)
            .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        )
        return Sim.ivfpq_topk(emb, queries, k=5, coarse_k=8, m=4, ksub=4, nprobe=2)

    ops = {
        "classifier_full": classifier,
        "dsir_full": dsir,
        "winnowing_full": winnow,
        "pq_adc_full": pq,
        "gif_decode_full": gif,
        "countmin_full": countmin,
        "containment_full": containment,
        "ivfpq_full": ivfpq,
    }

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", BASE), (f"sf1({k}x)", out_dir)):
        for name, fn in ops.items():
            best, shuffle_b, rows = None, None, None
            for _ in range(2):
                s0 = total_shuffle_write(spark)
                t0 = time.time()
                rows = fn(sf_dir).count()
                dt = time.time() - t0
                sb = total_shuffle_write(spark) - s0
                if best is None or dt < best:
                    best, shuffle_b = dt, sb
            results.setdefault(name, {})[sf_name] = {
                "sec": round(best, 2),
                "shuffle_mb": round(shuffle_b / 1e6, 1),
                "rows": rows,
            }
    for name, r in results.items():
        sf1_key = f"sf1({k}x)"
        r["ratio"] = round(r[sf1_key]["sec"] / max(r["sf0.1"]["sec"], 1e-9), 1)
    print(json.dumps({"k": k, "ops": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
