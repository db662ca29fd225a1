"""Stage-level decomposition of llm_curation_pipeline_neardup at sf0.1.

Times each piece of the pipeline with its own noop write so the wall
clock of the whole query can be attributed (guide §1.1/§1.5). Pieces are
cumulative plans (each includes its upstream), so the deltas between
consecutive numbers estimate per-stage cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

from query_engine_spark.session import get_spark
from query_engine_spark.sources.testdata import load_table
from query_engine_spark.llmdata import dedup as D, clear_llmdata_cache


def t(spark, label, df, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"{best:7.3f}  {label}", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-neardup")
    spark.range(1).count()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    docs.limit(1).count()

    # piece 1: repartition+persist base (as minhash_dedup_pairs does)
    base = docs.repartition(spark.sparkContext.defaultParallelism, F.col("doc_id"))
    t(spark, "1 base scan+repartition", base)

    # piece 2: signature table
    sigs = D.minhash_signature_table(base, "text", "doc_id", n_hashes=16, k=3)
    t(spark, "2 minhash signature table", sigs)

    # piece 3: banded
    banded = D._banded(sigs, 4, 4)
    t(spark, "3 banded", banded)

    # piece 4: candidate pairs (full helper incl persist)
    cand = D.lsh_candidate_pairs(base, "text", "doc_id", n_hashes=16, bands=4, k=3)
    t(spark, "4 lsh candidate pairs", cand)
    clear_llmdata_cache()

    # piece 5: verified pairs
    pairs = D.minhash_dedup_pairs(docs, n_hashes=16, bands=4, threshold=0.1)
    t(spark, "5 verified pairs (full minhash_dedup_pairs)", pairs)
    clear_llmdata_cache()

    # piece 6: + clusters + window + classifier = the full query
    from query_engine_spark import registry

    full = registry.REGISTRY["llm_curation_pipeline_neardup"].fn(spark, sf_dir)
    t(spark, "6 FULL llm_curation_pipeline_neardup", full)
    clear_llmdata_cache()

    # what does the shingle expression alone cost per doc pass?
    sh = docs.select("doc_id", F.array_distinct(D.word_shingles(F.col("text"), 3)).alias("sh"))
    t(spark, "7 shingle arrays (one pass)", sh)

    n = docs.count()
    print("docs:", n)


if __name__ == "__main__":
    main()
