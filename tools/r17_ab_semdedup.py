"""Same-session interleaved A/B: semdedup with the r17 assignment persist
(tracked_persist around kmeans_lloyd's (vec_id, cent_id) output — verdict
r16 item 7) vs without (pre-r17: both consumers replay the assignment
chain). The no-persist variant monkeypatches llmdata.tracked_persist to
identity for the DataFrame-construction call only — semdedup imports it at
call time. Parity collect-verified; min-of-N noop wall on the declared
embed_semdedup query shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from query_engine_spark import llmdata
    from query_engine_spark.llmdata import clear_llmdata_cache

    spark = get_spark("r17_ab_semdedup")
    spec = registry.REGISTRY["embed_semdedup"]

    real_persist = llmdata.tracked_persist

    def build(persist: bool):
        llmdata.tracked_persist = real_persist if persist else (lambda df: df)
        try:
            return spec.fn(spark, sf_dir)
        finally:
            llmdata.tracked_persist = real_persist

    ra = sorted(map(tuple, build(True).collect()))
    clear_llmdata_cache()
    rb = sorted(map(tuple, build(False).collect()))
    clear_llmdata_cache()
    assert ra == rb, f"PARITY FAIL: {len(ra)} vs {len(rb)}"
    print(f"parity OK: {len(ra)} rows identical")

    def timed(persist: bool) -> float:
        # time CONSTRUCTION + write, like bench.py: kmeans_lloyd's centroid
        # localCheckpoint is EAGER, so most of the query's work runs at
        # DataFrame-construction time (the r16 pagerank measurement trap)
        t0 = time.time()
        build(persist).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    timed(True)  # warmup
    times = {"persist": [], "no-persist": []}
    for _ in range(n):
        times["persist"].append(timed(True))
        times["no-persist"].append(timed(False))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
