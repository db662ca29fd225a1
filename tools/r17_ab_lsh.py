"""Same-session interleaved A/B for the MinHash-LSH persists under the
r16 AQE-reuse lens (verdict r16 item 3, second half): dedup_minhash_lsh
with each combination of

  - `banded` persist (lsh_candidate_pairs: signature+banding table shared
    by both self-join sides),
  - stage-input `df` persist (minhash_dedup_pairs: repartitioned docs
    shared by the signature agg and the two verify-join shingle sides).

Variants are inline copies of the two functions with persist toggles;
parity collect-verified, min-of-N noop wall on the declared query shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F


def pairs_variant(df: DataFrame, *, n_hashes: int, bands: int, threshold: float,
                  persist_banded: bool, persist_df: bool) -> DataFrame:
    from query_engine_spark.llmdata import tracked_persist
    from query_engine_spark.llmdata.dedup import (
        _banded, minhash_signature_table, word_shingles,
    )

    k = 3
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, F.col("doc_id"))
    if persist_df:
        df = tracked_persist(df)
    r = n_hashes // bands
    sigs = minhash_signature_table(df, "text", "doc_id", n_hashes=n_hashes, k=k)
    banded = _banded(sigs, bands, r)
    if persist_banded:
        banded = tracked_persist(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = df.select(F.col("doc_id").alias("id"), F.array_distinct(word_shingles(F.col("text"), k)).alias("sh"))
    return (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("__i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("__u", F.size(F.array_union("sh_a", "sh_b")))
        .withColumn("jaccard", F.round(F.col("__i") / F.col("__u"), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark import registry

    spark = get_spark("r17_ab_lsh")
    seeds, bands = registry._MINHASH_SEEDS, registry._MINHASH_BANDS

    def mk(pb: bool, pd: bool):
        docs = load_table(spark, sf_dir, "documents")
        return pairs_variant(docs, n_hashes=seeds, bands=bands, threshold=0.1,
                             persist_banded=pb, persist_df=pd)

    variants = {
        "banded+df (current)": (True, True),
        "df only           ": (False, True),
        "banded only       ": (True, False),
        "neither           ": (False, False),
    }

    ref = None
    for name, (pb, pd) in variants.items():
        rows = sorted(map(tuple, mk(pb, pd).collect()))
        clear_llmdata_cache()
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"PARITY FAIL {name}"
    print(f"parity OK: {len(ref)} rows identical across 4 variants")

    def timed(pb, pd) -> float:
        t0 = time.time()
        mk(pb, pd).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    timed(True, True)  # warmup
    times = {k: [] for k in variants}
    for _ in range(n):
        for name, (pb, pd) in variants.items():
            times[name].append(timed(pb, pd))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
