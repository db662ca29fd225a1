"""Same-session interleaved A/B: assign_cells as the crossJoin+window argmax
(current) vs the r16 map-only broadcast-array fold (reverted in r16 because
the fold re-evaluated in every consumer branch). Round 17 persists
semdedup's assignment output, which removes that re-evaluation — so the
fold's isolated win (0.66 vs 1.11 s) may now carry end-to-end. Runs the
REAL consumers' full declared query shapes, construction included (eager
kmeans checkpoint). Parity collect-verified per consumer."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, DataFrame, functions as F


def assign_cells_fold(
    embeddings: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cent_id",
    cent_vec_col: str = "cent_vec",
) -> DataFrame:
    """The r16 map-only fold form, verbatim (commit 59b955c^)."""
    from query_engine_spark.llmdata.similarity import dot, l2_norm

    carr = F.broadcast(
        centroids.select(
            F.struct(
                F.col(cent_id_col).alias("cent_id"),
                F.col(cent_vec_col).alias("cv"),
                l2_norm(F.col(cent_vec_col)).alias("__cn"),
            ).alias("c")
        ).agg(F.collect_list("c").alias("__cs"))
    )
    base = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("__vn"),
    ).crossJoin(carr)

    def better(acc: Column, cand: Column) -> Column:
        csim = F.round(dot(F.col("v"), cand["cv"]) / (F.col("__vn") * cand["__cn"]), 6)
        take = (
            acc["cent_id"].isNull()
            | (csim > acc["csim"])
            | ((csim == acc["csim"]) & (cand["cent_id"] < acc["cent_id"]))
        )
        return F.when(
            take, F.struct(csim.alias("csim"), cand["cent_id"].alias("cent_id"))
        ).otherwise(acc)

    init = F.struct(
        F.lit(None).cast("double").alias("csim"),
        F.lit(None).cast("long").alias("cent_id"),
    )
    return base.select(
        "vec_id", "v", F.aggregate("__cs", init, better)["cent_id"].alias("cent_id")
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))
    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark.llmdata import similarity as Sim

    spark = get_spark("r17_ab_assign")
    real = Sim.assign_cells

    QUERIES = ["embed_semdedup", "embed_kmeans", "embed_ivf_topk", "embed_ivfpq_topk"]

    def build(name, fold: bool):
        Sim.assign_cells = assign_cells_fold if fold else real
        try:
            return registry.REGISTRY[name].fn(spark, sf_dir)
        finally:
            Sim.assign_cells = real

    for name in QUERIES:
        a = sorted(map(tuple, build(name, False).collect())); clear_llmdata_cache()
        b = sorted(map(tuple, build(name, True).collect())); clear_llmdata_cache()
        assert a == b, f"PARITY FAIL {name}: {len(a)} vs {len(b)}"
        print(f"parity OK {name}: {len(a)} rows")

    def timed(name, fold):
        t0 = time.time()
        build(name, fold).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    for name in QUERIES:
        timed(name, False)  # warmup
        tw, tf = [], []
        for _ in range(n):
            tw.append(timed(name, False))
            tf.append(timed(name, True))
        print(f"{name}: window min {min(tw):.3f} {[round(x,3) for x in tw]} | "
              f"fold min {min(tf):.3f} {[round(x,3) for x in tf]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
