"""Round-7 100× re-measurement of the near-dup curation pipeline after the
connected-components rewrite (VERDICT r6 item 3: min-label propagation →
alternating large-star/small-star).

The r6 100× addendum measured `llm_curation_pipeline_neardup` at 241.7 s
on the structure-preserving 100× replica and attributed the extra factor
over its decontam sibling to the CC stage's per-round driver barrier
(min-label propagation: one localCheckpoint + one convergence count per
HOP of the near-dup graph). Star contraction converges in O(log diameter)
round pairs with one probe per pair, so the same data point re-run on the
new code isolates exactly that change — same replica scheme, same session
shape (driver mem sized per the r6 note), same min-of-2 noop-write timing.

Usage:
    PYTHONPATH=/root/repo SPARK_GRAFT_DRIVER_MEM=48g \
        python tools/scalestress_cc.py [replica_dir]

Prints one JSON line; SCALESTRESS_r07.md is written from the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["llm_curation_pipeline_neardup", "dedup_clusters"]


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf10"
    if not os.path.exists(os.path.join(replica, "documents.parquet")):
        from tools.scalestress_sf10 import build_dataset
        from query_engine_spark.session import get_spark

        build_dataset(get_spark("scalestress_cc_build"), 100, replica)

    from query_engine_spark.session import get_spark
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark import registry as R
    from tools.scalestress_sf10 import total_shuffle_write

    spark = get_spark("scalestress_cc")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = R.REGISTRY[name].fn
        walls = []
        shuffles = []
        for _ in range(2):
            clear_llmdata_cache()
            s0 = total_shuffle_write(spark)
            t0 = time.time()
            fn(spark, replica).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 1))
            shuffles.append(total_shuffle_write(spark) - s0)
        clear_llmdata_cache()
        out[name] = {
            "wall_sec_min_of_2": min(walls),
            "walls": walls,
            "shuffle_mb": round(min(shuffles) / 1e6, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"replica": replica, "results": out}))


if __name__ == "__main__":
    main()
