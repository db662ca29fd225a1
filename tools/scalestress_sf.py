"""Order-of-magnitude scale stress: replicate the sf0.1 parquet 10x into a
structure-preserving "sf1" dataset, run the headline query subset at BOTH
scales in one session, and report wall-clock + shuffle-write bytes per query.

The replication keeps per-copy semantics identical to sf0.1 so a LINEAR
engine should scale ~10x in work (never quadratically):

- every key column is offset by copy_i * 1e9 -> 10 disjoint replica
  universes; all FK joins behave as 10 independent sf0.1 instances
- documents.text gets every word suffixed with the copy id (disjoint
  vocabulary): shingle/minhash/simhash near-dup structure is preserved
  WITHIN a copy and no cross-copy near-dup pairs appear (plain id-offset
  replication would make every doc a 10-way duplicate -> quadratic
  candidate blowup that says nothing about the engine)
- embeddings get a copy-specific dimension PERMUTATION: all pairwise
  cosines within a copy are exactly preserved; cross-copy cosines decorrelate
  below the near-dup thresholds

Usage:
    PYTHONPATH=/root/repo python tools/scalestress_sf.py [K] [out_dir]

Prints one JSON line; the round report (SCALESTRESS_r03.md) is written from
this output.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

BASE = "/root/testdata/sf0.1"

TABLE_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIM_TABLES = ("region", "nation")
OFFSET = 1_000_000_000

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "s1_firehose",
    "s9_liked_weighted",
    "s10_liked_by_likers",
    "f14_regex",
    "o1_sort_created_top",
    "o7_posts_per_user",
    "a1_trending_tags",
    "pipeline_flagship",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "embed_srp_near_dup",
    "sessionize_events",
    "asof_join_events",
    "range_join_events",
    "rollup_gapfill_events",
    "kmv_distinct_users",
    "funnel_events",
    "retention_cohorts",
    "graph_triangles",
    "graph_pagerank",
    "text_tfidf_pairs",
    "kmv_set_ops_events",
    "llm_weighted_sample",
    "llm_ngram_lm",
    "stream_interval_join_pairs",
    "asof_join_directions",
    # round-3 additions
    "embed_semdedup",
    "text_repetition_features",
    "llm_doc_lm_score",
    "hybrid_rrf_search",
    "llm_curation_flags",
    "text_dup_spans",
    "llm_split_assign",
    "embed_label_centroids",
    "q4_order_priority",
    "q17_small_quantity",
    "q22_no_order_customers",
]


def build_dataset(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    dims = 64
    for name in DIM_TABLES:
        df = spark.read.parquet(f"{BASE}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    for name, keys in TABLE_KEYS.items():
        base = spark.read.parquet(f"{BASE}/{name}.parquet")
        copies = []
        for i in range(k):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(i * OFFSET))
            if name == "documents" and i > 0:
                # disjoint vocabulary per copy (see module docstring)
                c = c.withColumn("text", F.regexp_replace(F.col("text"), r"(\w+)", f"$1z{i}"))
            if name == "embeddings" and i > 0:
                perm = list(range(dims))
                random.Random(i).shuffle(perm)
                c = c.withColumn(
                    "embedding", F.array(*[F.col("embedding")[perm[j]] for j in range(dims)])
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def total_shuffle_write(spark) -> int:
    it = spark.sparkContext._jsc.sc().statusStore().executorList(False).iterator()
    tot = 0
    while it.hasNext():
        tot += it.next().totalShuffleWrite()
    return tot


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark.sources.testdata import TABLES, load_table

    spark = get_spark("scalestress_sf")
    spark.range(1).count()

    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.time()
        build_dataset(spark, k, out_dir)
        print(f"# built {k}x dataset at {out_dir} in {time.time() - t0:.0f}s", file=sys.stderr)

    for t in TABLES:
        load_table(spark, BASE, t).limit(1).count()
        load_table(spark, out_dir, t).limit(1).count()

    results: dict[str, dict] = {}
    for sf_name, sf_dir in (("sf0.1", BASE), ("sf1", out_dir)):
        for name in QUERIES:
            fn = registry.REGISTRY[name].fn
            best, shuffle_b, rows = None, None, None
            aborted = None
            for _ in range(2):
                s0 = total_shuffle_write(spark)
                t0 = time.time()
                try:
                    rows = fn(spark, sf_dir).count()
                except Exception as e:
                    # an explosion guard refusing quadratic work at scale is a
                    # PASS for scale safety, not a crash — record it as such
                    if "candidate-pair upper bound" in str(e):
                        aborted = round(time.time() - t0, 2)
                        clear_llmdata_cache()
                        break
                    raise
                dt = time.time() - t0
                sb = total_shuffle_write(spark) - s0
                clear_llmdata_cache()
                if best is None or dt < best:
                    best, shuffle_b = dt, sb
            if aborted is not None:
                results.setdefault(name, {})[sf_name] = {
                    "guard_abort_sec": aborted,
                    "rows": None,
                }
            else:
                results.setdefault(name, {})[sf_name] = {
                    "sec": round(best, 2),
                    "shuffle_mb": round(shuffle_b / 1e6, 1),
                    "rows": rows,
                }

    for name, r in results.items():
        if "sec" in r["sf1"] and "sec" in r["sf0.1"]:
            r["ratio"] = round(r["sf1"]["sec"] / max(r["sf0.1"]["sec"], 1e-9), 1)
        else:
            r["ratio"] = None  # guard abort at one scale — no wall ratio
    print(json.dumps({"k": k, "queries": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
