"""Same-session interleaved A/B: curation_flags exact-dup keeper as the r16
fingerprint WINDOW (`min(doc_id) over (partition by __fp)` — no map-side
partial agg, one hot fp = one giant window task at 100 TB) vs the r17
groupBy(min) + null-safe join (partial_merge HashAggregate + AQE-splittable
join; verdict r16 item 4). Parity collect-verified; min-of-N noop wall on
the full llm_curation_flags query shape."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F


def curation_flags_window(df: DataFrame, *, min_quality: float = 0.4,
                          max_top2_ppm: int = 100_000,
                          min_score_q: int = 33_000) -> DataFrame:
    """The r16 window form, inlined verbatim."""
    from query_engine_spark.llmdata import dedup as D
    from query_engine_spark.llmdata import textstats as Tx

    base = df.select(
        F.col("doc_id"),
        D.fingerprint(F.col("text")).alias("__fp"),
        Tx.quality_col(F.col("text")).alias("quality"),
        Tx.langid(F.col("text")).alias("lang_pred"),
    )
    w = Window.partitionBy("__fp")
    per_row = base.withColumn(
        "is_dup", F.col("doc_id") != F.min("doc_id").over(w)
    ).drop("__fp")
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
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata.corpus import curation_flags

    spark = get_spark("r17_ab_curation")
    docs = load_table(spark, sf_dir, "documents")

    va = lambda: curation_flags_window(docs)
    vb = lambda: curation_flags(docs)

    ra = sorted(map(tuple, va().collect()))
    rb = sorted(map(tuple, vb().collect()))
    assert ra == rb, f"PARITY FAIL: {len(ra)} vs {len(rb)}"
    print(f"parity OK: {len(ra)} rows identical")

    from query_engine_spark.llmdata import clear_llmdata_cache

    def noop(mk) -> float:
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    noop(va)  # warmup
    times = {"window (r16)": [], "groupBy+join (r17)": []}
    for _ in range(n):
        times["window (r16)"].append(noop(va))
        times["groupBy+join (r17)"].append(noop(vb))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
