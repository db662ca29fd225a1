"""PQ / IVF-PQ recall evidence (companion to ivf_recall.py).

Ground truth is the EXACT squared-L2 top-k on the integer-quantized grid —
the same metric ADC approximates — so the recall numbers isolate
quantization error (codebook coarseness, residual benefit, nprobe pruning)
rather than an L2-vs-cosine metric mismatch.

Sweeps:
  - flat PQ (`pq_adc_topk`) over m (subspaces) at fixed ksub;
  - IVF-PQ (`ivfpq_topk`) over nprobe at fixed (coarse_k, m, ksub).

Usage: python tools/pq_recall.py [sf_dir] [k] [n_queries]
Writes a markdown table to stdout; redirect/commit as docs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from query_engine_spark.llmdata import similarity as Sim
    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table

    spark = get_spark("pq_recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_vecs = emb.count()
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    # exact squared-L2 top-k on the quantized grid (brute force)
    q = emb.select(F.col("vec_id"), Sim.quantize_vec(F.col("embedding")).alias("qv"))
    qq = F.broadcast(
        queries.select(
            F.col("query_id"), Sim.quantize_vec(F.col("query_vec")).alias("qqv")
        )
    )
    t0 = time.time()
    pairs = q.crossJoin(qq).filter(F.col("vec_id") != F.col("query_id"))
    d = pairs.select(
        "query_id", "vec_id", Sim._l2_sq(F.col("qv"), F.col("qqv")).alias("d")
    )
    w = Window.partitionBy("query_id").orderBy("d", "vec_id")
    gt_df = d.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    gt: dict[int, set[int]] = {}
    for r in gt_df.collect():
        gt.setdefault(r.query_id, set()).add(r.vec_id)
    exact_wall = time.time() - t0

    def recall(df) -> tuple[float, float]:
        t0 = time.time()
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        wall = time.time() - t0
        hits = sum(len(got.get(qid, set()) & tv) for qid, tv in gt.items())
        return hits / (len(gt) * k), wall

    print(f"# PQ recall at {sf_dir}: {n_vecs} vectors, {len(gt)} queries, k={k}")
    print(f"# exact quantized-L2 brute force: {exact_wall:.2f}s\n")
    print("| config | bytes/vec (packed) | recall@%d | wall (s) |" % k)
    print("|---|---|---|---|")
    for m in (4, 8, 16):
        r, wall = recall(
            Sim.pq_adc_topk(emb, queries, k=k, m=m, ksub=16, iters=2)
        )
        print(f"| flat PQ m={m}, ksub=16 | {m} | {r:.3f} | {wall:.2f} |")
    for nprobe in (1, 2, 4):
        r, wall = recall(
            Sim.ivfpq_topk(
                emb, queries, k=k, coarse_k=20, coarse_iters=2, m=8, ksub=16,
                nprobe=nprobe,
            )
        )
        print(f"| IVF-PQ 20 cells, nprobe={nprobe}, m=8 | 8 (+cell id) | {r:.3f} | {wall:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
