"""Same-session interleaved A/B: unfused train+score classifier (the shipped
form) vs a fused single-tokenization variant (defined inline here; it LOST
the A/B and was not kept in the library).

The fused form pre-aggregates the token stream into per-(doc, bucket) counts
so one tokenization pass feeds both the model agg and the per-doc score
(the shared exchange is AQE-reused). It is bit-identical to the unfused
pair — verified by collect() below — but SLOWER: docs spread their tokens
over the 4096 buckets, so the per-(doc, bucket) partial agg barely
collapses and the shared exchange carries ~one row per token, while the
unfused groupBys partial-aggregate map-side to ≤n_buckets / per-doc rows
(near-zero shuffle). Measured (this box, sf0.1, min of 3 interleaved):
  llm_quality_classifier shape: unfused 0.843 s vs fused 0.862 s (wash)
  llm_curation_pipeline_neardup: unfused 1.993 s vs fused 2.409 s

Two probes, both min-of-N noop-sink wall at $SPARK_GRAFT_SF_DIR:
  1. operator-level on the raw documents table (llm_quality_classifier shape);
  2. the FULL llm_curation_pipeline_neardup query, with the fused variant
     injected by monkeypatching the (train, score) pair — full-consumer
     measurement per the round's assign_cells lesson (isolated numbers can
     mislead when downstream branches re-evaluate).
"""

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


def fused_train_and_score(
    docs: DataFrame,
    label,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    quant: int = 1_000_000,
) -> DataFrame:
    """One-tokenization-pass train+score; arithmetic byte-identical to
    hashed_classifier_score(docs, train_hashed_classifier(docs, label), label):
      n_pos(b)  = sum_(d,b) pos*cnt  == sum_tokens pos
      n_tot(b)  = sum_(d,b) cnt      == sum_tokens 1
      sum_w_q(d)= sum_(d,b) cnt*w_q  == sum_tokens w_q (LEFT join, absent -> 0)
      n_tokens(d)= sum_(d,b) cnt     == sum_tokens 1
    """
    from query_engine_spark.llmdata.textstats import _tokens, hash_bucket

    labeled = docs.select(
        F.col(id_col), label.alias("__pos"), F.col(text_col).alias("__text")
    )
    toks = labeled.select(
        id_col, "__pos", F.explode(_tokens(F.col("__text"))).alias("t")
    ).filter(F.col("t") != "")
    per_doc_bkt = (
        toks.select(id_col, "__pos", hash_bucket(F.col("t"), n_buckets).alias("bkt"))
        .groupBy(id_col, "__pos", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = per_doc_bkt.groupBy("bkt").agg(
        F.sum(F.when(F.col("__pos"), F.col("cnt")).otherwise(F.lit(0))).alias("n_pos"),
        F.sum("cnt").alias("n_tot"),
    )
    w = F.floor((F.col("n_pos") + 1) * quant / (F.col("n_tot") + 2)).cast("long")
    weights = counts.select("bkt", (w - quant // 2).alias("w_q"))
    agg = (
        per_doc_bkt.join(F.broadcast(weights), "bkt", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.col("cnt") * F.coalesce("w_q", F.lit(0))).alias("sum_w_q"),
        )
    )
    mean_w = F.floor(F.col("sum_w_q") / F.col("n_tokens")).cast("long")
    scored = agg.select(id_col, "n_tokens", mean_w.alias("mean_w_q"))
    base = docs.select(id_col).join(scored, id_col, "left")
    prior = docs.agg(
        (
            F.floor(
                (F.sum(F.when(label, 1).otherwise(0)) + 1)
                * quant
                / (F.count(F.lit(1)) + 2)
            ).cast("long")
            - quant // 2
        ).alias("prior_q")
    )
    out = base.crossJoin(F.broadcast(prior)).select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        (F.col("prior_q") + F.coalesce("mean_w_q", F.lit(0))).alias("score_q"),
    )
    return out.withColumn("pred", F.col("score_q") > 0)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata import textstats as Tx
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark import registry

    spark = get_spark("r16_ab_classifier")
    docs = load_table(spark, sf_dir, "documents")
    is_en = F.col("lang") == "en"

    def variant_a():  # unfused (shipped)
        w = Tx.train_hashed_classifier(docs, is_en)
        out = Tx.hashed_classifier_score(docs, w, is_en)
        return out.join(docs.select("doc_id", is_en.alias("is_en")), "doc_id").select(
            "doc_id", "n_tokens", "score_q", "pred", "is_en"
        )

    def variant_b():  # fused
        out = fused_train_and_score(docs, is_en)
        return out.join(docs.select("doc_id", is_en.alias("is_en")), "doc_id").select(
            "doc_id", "n_tokens", "score_q", "pred", "is_en"
        )

    # bit-identical?
    ra = sorted(map(tuple, variant_a().collect()))
    rb = sorted(map(tuple, variant_b().collect()))
    print(f"results identical: {ra == rb} ({len(ra)} rows)")

    noop(variant_a())
    noop(variant_b())
    ta, tb = [], []
    for _ in range(n):
        spark.sparkContext.setJobDescription("A: unfused classifier")
        ta.append(noop(variant_a()))
        spark.sparkContext.setJobDescription("B: fused classifier")
        tb.append(noop(variant_b()))
    print(f"llm_quality_classifier shape: unfused min {min(ta):.3f}s {sorted(ta)} "
          f"vs fused min {min(tb):.3f}s {sorted(tb)}")

    # --- full pipeline query: shipped (unfused) vs fused injected ---
    real_train = Tx.train_hashed_classifier
    real_score = Tx.hashed_classifier_score
    _SENTINEL = object()

    def train_stub(df, label, **kw):
        return _SENTINEL

    def score_fused(df, model, label, **kw):
        assert model is _SENTINEL
        kw.pop("prior_q", None)
        return fused_train_and_score(df, label, **kw)

    def run_pipeline() -> float:
        t = noop(registry.REGISTRY["llm_curation_pipeline_neardup"].fn(spark, sf_dir))
        clear_llmdata_cache()
        return t

    run_pipeline()  # warmup
    tpa, tpb = [], []
    for _ in range(n):
        Tx.train_hashed_classifier, Tx.hashed_classifier_score = real_train, real_score
        spark.sparkContext.setJobDescription("A: pipeline unfused")
        tpa.append(run_pipeline())
        Tx.train_hashed_classifier, Tx.hashed_classifier_score = train_stub, score_fused
        spark.sparkContext.setJobDescription("B: pipeline fused")
        tpb.append(run_pipeline())
    Tx.train_hashed_classifier, Tx.hashed_classifier_score = real_train, real_score
    print(f"llm_curation_pipeline_neardup: unfused min {min(tpa):.3f}s {sorted(tpa)} "
          f"vs fused min {min(tpb):.3f}s {sorted(tpb)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
