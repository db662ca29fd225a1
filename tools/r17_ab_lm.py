"""Same-session interleaved A/B: lm_score_docs / stupid_backoff_score with
the pre-r17 TWO-EXPLODE self-training shape (inlined here verbatim) vs the
r17 shared-gram rollup shape (corpus LM counts rolled up from the per-(doc,
gram) pre-agg, UNPERSISTED — AQE ReuseExchange dedups the (doc_id, g)
exchange between the LM build and the scoring probe). Min-of-N noop-sink
wall on the full declared query shapes; collect-verified identical first."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def lm_score_docs_old(df: DataFrame, *, n: int = 2, min_count: int = 2,
                      quant: int = 10**6) -> DataFrame:
    """Pre-r17 shape: self-training LM from its OWN corpus explode."""
    from query_engine_spark.llmdata.dedup import word_shingles
    from query_engine_spark.llmdata.textstats import ngram_lm

    grams = df.select(
        F.col("doc_id"),
        F.explode(word_shingles(F.col("text"), n)).alias("g"),
    )
    lm = ngram_lm(df, n, min_count=min_count, quant=quant)
    lm_side = lm.select(F.col("ngram").alias("g"), "prob_q")
    dg = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    joined = dg.join(lm_side, "g", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.when(F.col("prob_q").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias("oov"),
            F.sum(F.coalesce(F.col("prob_q"), F.lit(0)) * F.col("cnt")).alias("sum_prob_q"),
        )
        .withColumn("score_q", F.expr("sum_prob_q div n_grams"))
    )


def stupid_backoff_old(df: DataFrame, *, min_count: int = 2, quant: int = 10**6,
                       alpha_num: int = 4, alpha_den: int = 10) -> DataFrame:
    """Pre-r17 shape: trigram LM from its own third explode."""
    from query_engine_spark.llmdata.dedup import word_shingles
    from query_engine_spark.llmdata.textstats import ngram_lm

    lm3 = ngram_lm(df, 3, min_count=min_count, quant=quant)
    lm2 = ngram_lm(df, 2, min_count=min_count, quant=quant)
    dg = (
        df.select(F.col("doc_id"), F.explode(word_shingles(F.col("text"), 3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("g2", F.regexp_replace("g", "^[^ ]+ ", ""))
    )
    j = (
        dg.join(lm3.select(F.col("ngram").alias("g"), F.col("prob_q").alias("p3")), "g", "left")
        .join(lm2.select(F.col("ngram").alias("g2"), F.col("prob_q").alias("p2")), "g2", "left")
    )
    backoff = F.coalesce(F.col("p3"), F.expr(f"(p2 * {alpha_num}) div {alpha_den}"), F.lit(0))
    return (
        j.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.when(F.col("p3").isNotNull(), F.col("cnt")).otherwise(F.lit(0))).alias("tri_hits"),
            F.sum(F.when(F.col("p3").isNull() & F.col("p2").isNotNull(), F.col("cnt")).otherwise(F.lit(0))).alias("bi_hits"),
            F.sum(F.when(F.col("p3").isNull() & F.col("p2").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias("oov"),
            F.sum(backoff * F.col("cnt")).alias("sum_q"),
        )
        .withColumn("score_q", F.expr("sum_q div n_grams"))
        .drop("sum_q")
    )


def parity(spark, a: DataFrame, b: DataFrame, keys) -> None:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, f"PARITY FAIL ({keys}): {len(ra)} vs {len(rb)} rows / first diff " + str(
        next((x, y) for x, y in zip(ra, rb) if x != y)
    )
    print(f"parity OK ({keys}): {len(ra)} rows identical")


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata import textstats as Tx

    spark = get_spark("r17_ab_lm")
    docs = load_table(spark, sf_dir, "documents")

    variants = {
        "lm_score OLD (2 explodes)": lambda: lm_score_docs_old(docs, n=2, min_count=2),
        "lm_score NEW (shared dg) ": lambda: Tx.lm_score_docs(docs, n=2, min_count=2),
        "backoff  OLD (3 explodes)": lambda: stupid_backoff_old(docs, min_count=2),
        "backoff  NEW (shared dg) ": lambda: Tx.stupid_backoff_score(docs, min_count=2),
    }

    parity(spark, variants["lm_score OLD (2 explodes)"](), variants["lm_score NEW (shared dg) "](), "lm_score")
    parity(spark, variants["backoff  OLD (3 explodes)"](), variants["backoff  NEW (shared dg) "](), "backoff")

    # warmup
    noop(variants["lm_score OLD (2 explodes)"]())
    times = {k: [] for k in variants}
    for _ in range(n):
        for k, v in variants.items():
            times[k].append(noop(v()))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
