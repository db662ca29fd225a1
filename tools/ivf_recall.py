"""IVF ANN recall/latency sweep (VERDICT r3 advice #8 / r4 #4).

For each nprobe, runs `ivf_topk` over the sf-dir embeddings table against the
exact brute-force `cosine_topk` ground truth, and reports recall@k + wall
time. Same deterministic centroid rule as the registry's `embed_ivf_topk`
(vec_id % cent_mod == 0), so the sweep characterizes exactly the shipped
operator.

Usage: python tools/ivf_recall.py [sf_dir] [k] [n_queries]
Writes a markdown table to stdout; redirect/commit as docs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    cent_mod = 100

    from query_engine_spark.llmdata import similarity as Sim
    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table

    spark = get_spark("ivf_recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n_vecs = emb.count()
    cents = emb.filter(F.col("vec_id") % cent_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    n_cells = cents.count()
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    # exact ground truth + its cost (the baseline ANN must beat)
    t0 = time.time()
    exact_rows = Sim.cosine_topk(emb, queries, k=k).collect()
    t_exact = time.time() - t0
    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])

    # learned centroids: kmeans assignment -> per-cell per-dimension mean
    # (derived with DataFrame ops from the shipped kmeans_lloyd output)
    asgn = Sim.kmeans_lloyd(emb, k=n_cells, iters=3)
    qv = emb.select("vec_id", Sim.quantize_vec(F.col("embedding")).alias("qvec"))
    cents_km = (
        asgn.join(qv, "vec_id")
        .select("cent_id", F.posexplode("qvec").alias("pos", "x"))
        .groupBy("cent_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cent_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cent_id", F.transform("pm", lambda e: e["m"]).alias("cent_vec"))
        .cache()
    )
    cents_km.count()

    print(f"# IVF recall/latency sweep — {os.path.basename(os.path.normpath(sf_dir))}")
    print()
    print(f"{n_vecs} vectors, {n_cells} cells, {n_queries} queries, k={k}. "
          f"Exact brute-force: {t_exact:.2f}s wall (the 100% recall reference). "
          f"Two centroid sources: the registry's deterministic sample "
          f"(vec_id%{cent_mod}==0) and learned (kmeans_lloyd, 3 iters).")
    print()
    print(f"| nprobe | cells scanned | recall@{k} (sampled) | wall (s) | "
          f"recall@{k} (kmeans) | wall (s) | vs exact |")
    print("|---|---|---|---|---|---|---|")
    for nprobe in (1, 2, 4, 8, 16):
        out = []
        for cent_tbl in (cents, cents_km):
            t0 = time.time()
            rows = Sim.ivf_topk(emb, cent_tbl, queries, k=k, nprobe=nprobe).collect()
            t_ann = time.time() - t0
            got: dict[int, set[int]] = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["vec_id"])
            recalls = [
                len(got.get(q, set()) & truth[q]) / max(1, len(truth[q])) for q in truth
            ]
            out.append((sum(recalls) / len(recalls), t_ann))
        frac = min(1.0, nprobe / n_cells)
        print(
            f"| {nprobe} | {frac:.1%} | {out[0][0]:.3f} | {out[0][1]:.2f} | "
            f"{out[1][0]:.3f} | {out[1][1]:.2f} | {out[1][1] / t_exact:.2f}x |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
