"""Same-session interleaved A/B: kmv_set_ops row-per-hash tagged-union form
(pre-r16, inlined here verbatim) vs the r16 array-sketch broadcast form.
Min-of-N noop-sink wall on the full kmv_set_ops_events query shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def kmv_set_ops_old(df: DataFrame, set_col: str, value_col: str, k: int = 64) -> DataFrame:
    from query_engine_spark.operators.sketches import md5_hash60, _H_MAX

    sk = (
        df.select(F.col(set_col).cast("string").alias("__s"), md5_hash60(value_col).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy("__s").orderBy("__h")
    sk = sk.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k)
    a = sk.select(F.col("__s").alias("set_a"), F.col("__h").alias("__ha"))
    b = sk.select(F.col("__s").alias("set_b"), F.col("__h").alias("__hb"))
    sids = sk.select(F.col("__s")).distinct()
    pairs = (
        sids.select(F.col("__s").alias("set_a"))
        .join(sids.select(F.col("__s").alias("set_b")))
        .filter(F.col("set_a") < F.col("set_b"))
    )
    rows_a = pairs.join(a, "set_a").select(
        "set_a", "set_b", F.col("__ha").alias("__h"), F.lit(1).alias("__ina"), F.lit(0).alias("__inb")
    )
    rows_b = pairs.join(b, "set_b").select(
        "set_a", "set_b", F.col("__hb").alias("__h"), F.lit(0).alias("__ina"), F.lit(1).alias("__inb")
    )
    merged = (
        rows_a.unionByName(rows_b)
        .groupBy("set_a", "set_b", "__h")
        .agg(F.max("__ina").alias("__ina"), F.max("__inb").alias("__inb"))
    )
    wm = Window.partitionBy("set_a", "set_b").orderBy("__h")
    merged = merged.withColumn("__rk", F.row_number().over(wm)).filter(F.col("__rk") <= k)
    agg = merged.groupBy("set_a", "set_b").agg(
        F.count("*").alias("__m"),
        F.max(F.col("__h")).alias("__kth"),
        F.sum((F.col("__ina") * F.col("__inb")).cast("bigint")).alias("__both"),
    )
    union_est = F.when(F.col("__m") < k, F.col("__m").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(_H_MAX) / F.col("__kth").cast("double")
    )
    jac = F.col("__both").cast("double") / F.col("__m").cast("double")
    return agg.select(
        "set_a", "set_b",
        union_est.alias("union_est"), jac.alias("jaccard_est"),
        (jac * union_est).alias("inter_est"),
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.operators import sketches as Sk

    spark = get_spark("r16_ab_kmv")
    ev = load_table(spark, sf_dir, "events")

    def wrap(out):
        return out.select(
            "set_a", "set_b",
            F.round("union_est", 4).alias("union_est"),
            F.round("jaccard_est", 6).alias("jaccard_est"),
            F.round("inter_est", 4).alias("inter_est"),
        )

    va = lambda: wrap(kmv_set_ops_old(ev, "event_type", "user_id", k=64))
    vb = lambda: wrap(Sk.kmv_set_ops(ev, "event_type", "user_id", k=64))

    # results identical?
    ra = sorted(map(tuple, va().collect()))
    rb = sorted(map(tuple, vb().collect()))
    print(f"results identical: {ra == rb} ({len(ra)} pairs)")

    noop(va()); noop(vb())
    ta, tb = [], []
    for _ in range(n):
        spark.sparkContext.setJobDescription("A: kmv tagged-union")
        ta.append(noop(va()))
        spark.sparkContext.setJobDescription("B: kmv array sketch")
        tb.append(noop(vb()))
    print(f"kmv_set_ops_events: old min {min(ta):.3f}s {sorted(ta)} "
          f"vs array min {min(tb):.3f}s {sorted(tb)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
