"""Round-5 targeted scale stress (VERDICT r4 ask #5): the two knobs round 4
added, measured at 10x.

(a) `semdedup` auto-k: k=None follows the growth law k = n//target, so pair
    work stays ~n*target (linear). Run the operator at sf0.1 and at the 10x
    replica (structure-preserving, tools/scalestress_sf.build_dataset) and
    report the wall-clock ratio — linear shapes on this host land well under
    10x wall; a fixed-k (quadratic-cluster) regression would blow past it.

(b) `tfidf_pairs` max_pairs guard: on a HUB-vocabulary 10x replication
    (id-offset copies WITHOUT the disjoint-vocab suffix — every term's df
    multiplies by 10, the exact shape that measured a 344x candidate blowup
    in round 3), the in-plan assert_true must abort in seconds, BEFORE the
    term-keyed pair shuffle. Also measures guard overhead on the sane corpus
    (guard on vs max_pairs=None).

Usage: PYTHONPATH=/root/repo python tools/scalestress_r05.py [k] [out_dir]
Prints one JSON line; SCALESTRESS_r05.md is written from it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    hub_docs = "/tmp/spark_graft_hubdocs.parquet"

    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from query_engine_spark.llmdata import similarity as Sim, textstats as Tx
    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from tools.scalestress_sf import build_dataset

    spark = get_spark("scalestress_r05")
    spark.range(1).count()

    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.time()
        build_dataset(spark, k, out_dir)
        print(f"# built {k}x dataset in {time.time() - t0:.0f}s", file=sys.stderr)

    # hub-vocabulary documents: id-offset copies, SAME vocabulary (df x k)
    if not os.path.exists(hub_docs):
        base = spark.read.parquet(f"{BASE}/documents.parquet")
        copies = [
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
            for i in range(k)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(hub_docs)

    results: dict[str, dict] = {}

    # (a) semdedup auto-k at both scales
    for tag, d in (("sf0.1", BASE), ("sf1", out_dir)):
        emb = load_table(spark, d, "embeddings")
        best = None
        for _ in range(2):
            t0 = time.time()
            n_rows = Sim.semdedup(emb, k=None, target_cluster_size=200).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("semdedup_auto_k", {})[tag] = {
            "sec": round(best, 2),
            "rows": n_rows,
        }
    r = results["semdedup_auto_k"]
    r["ratio"] = round(r["sf1"]["sec"] / r["sf0.1"]["sec"], 2)

    # (b1) hub-vocabulary replication: measure the candidate-pair mass
    # directly (same Σ df·(df−1)/2 the guard computes), then show the guard
    # aborting pre-shuffle when the budget is the LINEAR-scaling one a
    # capacity plan would set (10x data -> 10x pair budget; hub vocab makes
    # actual mass grow ~quadratically, which is exactly what must fail loudly)
    def pair_mass(docs_df):
        toks = Tx._tokens(F.col("text"))
        base = docs_df.select(F.col("doc_id").alias("id"), F.explode(toks).alias("t")).filter(
            F.col("t") != ""
        )
        n = docs_df.count()
        cap = max(2, int(0.1 * n))
        dfreq = (
            base.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
            .groupBy("t").agg(F.count(F.lit(1)).alias("df"))
            .filter((F.col("df") >= 2) & (F.col("df") <= cap))
        )
        row = dfreq.agg(
            F.sum(F.col("df").cast("double") * (F.col("df") - 1) / 2).alias("m")
        ).collect()[0]
        return int(row["m"] or 0)

    docs_sane = load_table(spark, BASE, "documents")
    docs_hub = spark.read.parquet(hub_docs)
    mass_sane = pair_mass(docs_sane)
    mass_hub = pair_mass(docs_hub)
    linear_budget = mass_sane * k  # what 10x data justifies for a linear op
    t0 = time.time()
    try:
        Tx.tfidf_pairs(docs_hub, max_df_frac=0.1, min_cos=0.2, max_pairs=linear_budget).count()
        fired, msg = False, None
    except Exception as e:  # assert_true surfaces as a Spark job failure
        fired = "candidate-pair upper bound" in str(e)
        msg = str(e).split("\n")[0][:160]
    results["tfidf_guard_hub"] = {
        "mass_sane_sf01": mass_sane,
        "mass_hub_10x": mass_hub,
        "mass_growth": round(mass_hub / max(mass_sane, 1), 1),
        "linear_budget": linear_budget,
        "fired": fired,
        "abort_sec": round(time.time() - t0, 2),
        "msg": msg,
    }

    # (b2) guard overhead on the sane corpus
    docs = load_table(spark, BASE, "documents")
    for tag, mp in (("guard_on", 10_000_000), ("guard_off", None)):
        best = None
        for _ in range(2):
            t0 = time.time()
            Tx.tfidf_pairs(docs, max_df_frac=0.1, min_cos=0.2, max_pairs=mp).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results.setdefault("tfidf_guard_overhead", {})[tag] = round(best, 2)
    o = results["tfidf_guard_overhead"]
    o["overhead_pct"] = round((o["guard_on"] - o["guard_off"]) / o["guard_off"] * 100, 1)

    print(json.dumps({"k": k, "results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
