"""100x scale probe (VERDICT r5 item 3): one order of magnitude beyond the
r5 10x stress, for the three queries whose 10x ratios were worst —
`dedup_minhash_lsh` (3.5x), `events_anomaly_zscore` (3.3x),
`q21_waiting_suppliers` (3.0x). The 10x evidence said "overhead-dominated,
shuffle linear"; a 100x point distinguishes that from creeping
superlinearity (an O(n^1.2) term invisible at 10x is a 2.5x lie at 100x),
and q21's AQE broadcast->shuffle flip gets exercised at real size.

Replication is the same structure-preserving scheme as scalestress_sf.py
(disjoint key universes per copy; disjoint vocabulary per documents copy so
no cross-copy near-dup pairs appear) but builds ONLY the tables these three
queries read — documents, events, lineitem, orders, supplier + dims.

Usage:
    PYTHONPATH=/root/repo python tools/scalestress_sf10.py [K] [out_dir]

Prints one JSON line per query with wall seconds and shuffle-write bytes at
both scales.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASE = "/root/testdata/sf0.1"
OFFSET = 1_000_000_000

TABLE_KEYS: dict[str, list[str]] = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}
DIM_TABLES = ("region", "nation")

QUERIES = ["dedup_minhash_lsh", "events_anomaly_zscore", "q21_waiting_suppliers"]


def build_dataset(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for name in DIM_TABLES:
        spark.read.parquet(f"{BASE}/{name}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
    for name, keys in TABLE_KEYS.items():
        base = spark.read.parquet(f"{BASE}/{name}.parquet")
        # build via an exploded copy-id cross join instead of a k-way union:
        # a 100-element union plan takes minutes to analyze; this is one
        # generator join and scales to any k
        copies = spark.range(k).select(F.col("id").alias("__copy"))
        out = base.crossJoin(F.broadcast(copies))
        for key in keys:
            out = out.withColumn(key, F.col(key) + F.col("__copy") * F.lit(OFFSET))
        if name == "documents":
            out = out.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.regexp_replace(
                        F.col("text"),
                        r"(\w+)",
                        F.concat(F.lit("$1z"), F.col("__copy").cast("string")),
                    )
                ),
            )
        out.drop("__copy").write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def total_shuffle_write(spark) -> int:
    it = spark.sparkContext._jsc.sc().statusStore().executorList(False).iterator()
    tot = 0
    while it.hasNext():
        tot += it.next().totalShuffleWrite()
    return tot


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf10"

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from query_engine_spark.llmdata import clear_llmdata_cache

    spark = get_spark("scalestress_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        t0 = time.time()
        build_dataset(spark, k, out_dir)
        print(json.dumps({"build_sec": round(time.time() - t0, 1), "k": k}))

    results = []
    for name in QUERIES:
        row: dict = {"query": name, "k": k}
        for tag, sf_dir in (("base", BASE), (f"x{k}", out_dir)):
            best, sw = float("inf"), 0
            for _ in range(2):
                s0 = total_shuffle_write(spark)
                t0 = time.time()
                registry.REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                if dt < best:
                    best, sw = dt, total_shuffle_write(spark) - s0
                clear_llmdata_cache()
            row[f"wall_{tag}"] = round(best, 2)
            row[f"shuffle_mb_{tag}"] = round(sw / 1e6, 1)
        row["ratio"] = round(row[f"wall_x{k}"] / max(row["wall_base"], 1e-9), 1)
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"all": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
