"""Same-session interleaved A/B: curation_flags' `repetitive` signal from
the full repetition_features n ∈ {1,2,3} union (the shape committed earlier
in r17) vs the shared-bigram form — top2_ppm computed from the SAME
`_doc_gram_counts(df, 2)` subtree lm_score_docs pre-aggregates, so AQE's
ReuseExchange dedups the bigram explode + partial agg (this mirrors the
oracle SQL, whose `c2` table feeds both the repetition and the LM score).
Parity collect-verified; min-of-N noop wall on the full llm_curation_flags
query shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def curation_flags_3stream(df: DataFrame, *, min_quality: float = 0.4,
                           max_top2_ppm: int = 100_000,
                           min_score_q: int = 33_000) -> DataFrame:
    """The earlier-r17 form, inlined verbatim: groupBy+join keeper (kept)
    but `repetitive` from repetition_features' three-stream union."""
    from query_engine_spark.llmdata import dedup as D
    from query_engine_spark.llmdata import textstats as Tx
    from query_engine_spark.llmdata import tracked_persist

    base = tracked_persist(df.select(
        F.col("doc_id"),
        D.fingerprint(F.col("text")).alias("__fp"),
        Tx.quality_col(F.col("text")).alias("quality"),
        Tx.langid(F.col("text")).alias("lang_pred"),
    ))
    keeper = (
        base.groupBy("__fp")
        .agg(F.min("doc_id").alias("__keep_id"))
        .withColumnRenamed("__fp", "__kfp")
    )
    per_row = (
        base.join(keeper, F.col("__fp").eqNullSafe(F.col("__kfp")), "inner")
        .select(
            "doc_id",
            (F.col("doc_id") != F.col("__keep_id")).alias("is_dup"),
            "quality",
            "lang_pred",
        )
    )
    rep = Tx.repetition_features(df).select("doc_id", "top2_ppm")
    lmsc = Tx.lm_score_docs(df).select("doc_id", "score_q")
    out = (
        per_row
        .join(rep, "doc_id", "left")
        .join(lmsc, "doc_id", "left")
        .select(
            "doc_id",
            "is_dup",
            (F.col("lang_pred") == "und").alias("bad_lang"),
            (F.col("quality") < min_quality).alias("low_quality"),
            F.coalesce(F.col("top2_ppm") > max_top2_ppm, F.lit(False)).alias("repetitive"),
            F.coalesce(F.col("score_q") < min_score_q, F.lit(False)).alias("unlikely"),
        )
    )
    return out.withColumn(
        "keep",
        ~(F.col("is_dup") | F.col("bad_lang") | F.col("low_quality")
          | F.col("repetitive") | F.col("unlikely")),
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "4"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata.corpus import curation_flags

    spark = get_spark("r17_ab_curation2")
    docs = load_table(spark, sf_dir, "documents")

    va = lambda: curation_flags_3stream(docs)
    vb = lambda: curation_flags(docs)

    from query_engine_spark.llmdata import clear_llmdata_cache

    ra = sorted(map(tuple, va().collect()))
    clear_llmdata_cache()
    rb = sorted(map(tuple, vb().collect()))
    clear_llmdata_cache()
    assert ra == rb, f"PARITY FAIL: {len(ra)} vs {len(rb)}"
    print(f"parity OK: {len(ra)} rows identical")

    def noop(mk) -> float:
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    noop(va)  # warmup
    times = {"3-stream rep (early r17)": [], "shared-bigram rep (new)": []}
    for _ in range(n):
        times["3-stream rep (early r17)"].append(noop(va))
        times["shared-bigram rep (new)"].append(noop(vb))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
