"""Same-session interleaved A/B for embed_srp_near_dup (untouched since its
build round): (1) hoist the per-side L2 norms below the verify join —
cosine() inlined in the pair join recomputes BOTH 64-dim interpreted norm
folds per candidate pair (the r6 lesson, float-identical hoist:
dot/(na*nb) is the same ops in the same order as dot/(l2·l2)); (2) re-check
both persists under the AQE-reuse lens — the repartition is an exchange all
three embedding consumers sit on, and the signature table ends in a
groupBy(id) exchange both banded join sides share (the simhash de-persist
mechanism). Parity collect-verified; min-of-N construction+noop wall."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def srp_variant(embeddings: DataFrame, threshold: float, *, bits=16, dims=64,
                chunks=2, hoist_norms: bool, persist_emb: bool,
                persist_sig: bool) -> DataFrame:
    from query_engine_spark.llmdata import tracked_persist
    from query_engine_spark.llmdata.similarity import (
        cosine, dot, l2_norm, srp_signature_table,
    )

    emb = embeddings.repartition(
        embeddings.sparkSession.sparkContext.defaultParallelism, F.col("vec_id"))
    if persist_emb:
        emb = tracked_persist(emb)
    sig = srp_signature_table(emb, bits, dims)
    if persist_sig:
        sig = tracked_persist(sig)
    width = bits // chunks
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright(F.col("code"), c * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("cv"))
            for c in range(chunks)
        ])).alias("e"),
    ).select("id", "e.chunk", "e.cv")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.cv") == F.col("b.cv")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if hoist_norms:
        va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
                        l2_norm(F.col("embedding")).alias("na"))
        vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
                        l2_norm(F.col("embedding")).alias("nb"))
        sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    else:
        va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
        sim = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))
    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata import clear_llmdata_cache

    spark = get_spark("r17_ab_srp")
    emb = load_table(spark, sf_dir, "embeddings")

    variants = {
        "current (inline cos, both persists)": dict(hoist_norms=False, persist_emb=True, persist_sig=True),
        "hoist norms, both persists        ": dict(hoist_norms=True, persist_emb=True, persist_sig=True),
        "hoist, emb persist only           ": dict(hoist_norms=True, persist_emb=True, persist_sig=False),
        "hoist, sig persist only           ": dict(hoist_norms=True, persist_emb=False, persist_sig=True),
        "hoist, no persists                ": dict(hoist_norms=True, persist_emb=False, persist_sig=False),
    }

    ref = None
    for name, kw in variants.items():
        rows = sorted(map(tuple, srp_variant(emb, 0.3, **kw).collect()))
        clear_llmdata_cache()
        if ref is None:
            ref = rows
            print(f"candidate-pair output rows: {len(ref)}")
        else:
            assert rows == ref, f"PARITY FAIL {name}"
    print("parity OK across 5 variants")

    def timed(kw):
        t0 = time.time()
        srp_variant(emb, 0.3, **kw).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    timed(variants["current (inline cos, both persists)"])  # warmup
    times = {k: [] for k in variants}
    for _ in range(n):
        for name, kw in variants.items():
            times[name].append(timed(kw))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
