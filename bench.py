"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total of per-query MINIMUM wall-clock over N passes
(default 3, $SPARK_GRAFT_BENCH_N) — single-run numbers on a busy host swing
~18% run-to-run, too noisy to trust regressions. Each query is fully
materialized via count(); the first pass still pays plan/codegen cost, so the
min reflects steady-state execution (`first_pass` in the JSON keeps the
cold-path total for reference against BASELINE.md's cold scans).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "s1_firehose",
    "s9_liked_weighted",
    "s10_liked_by_likers",
    "f14_regex",
    "o1_sort_created_top",
    "a1_trending_tags",
    "sc_hn_normalized",
    "pipeline_flagship",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "embed_srp_near_dup",
    "text_quality",
    "sessionize_events",
    "o7_posts_per_user",
    "stream_windowed_counts",
    "asof_join_events",
    "range_join_events",
    "rollup_gapfill_events",
    "kmv_distinct_users",
    "funnel_events",
    "retention_cohorts",
    "graph_triangles",
    "graph_pagerank",
    "text_tfidf_pairs",
    "kmv_set_ops_events",
    "llm_weighted_sample",
    "embed_semdedup",
    "text_repetition_features",
    "llm_doc_lm_score",
    "hybrid_rrf_search",
    "llm_curation_flags",
    "q17_small_quantity",
    "q7_nation_volume",
    "text_dup_spans",
    "llm_stupid_backoff",
    "events_transition_matrix",
]


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry

    spark = get_spark("bench")
    # Session warmup: first action pays JVM/codegen/parquet-footer costs that
    # belong to the runtime, not any query. One trivial scan per table.
    from query_engine_spark.sources.testdata import TABLES, load_table

    spark.range(1).count()
    for t in TABLES:
        load_table(spark, sf_dir, t).limit(1).count()

    from query_engine_spark.llmdata import clear_llmdata_cache

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_N", "3"))
    runs: list[dict[str, float]] = []
    for _ in range(n_runs):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            spec = registry.REGISTRY[name]
            t0 = time.time()
            spec.fn(spark, sf_dir).count()
            timings[name] = time.time() - t0
            # free tracked llmdata persists so queries don't inherit each
            # other's cached blocks (and a long-lived driver doesn't leak)
            clear_llmdata_cache()
        runs.append(timings)
    best = {name: round(min(r[name] for r in runs), 3) for name in HEADLINE}
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "n_runs": n_runs,
        "first_pass": round(sum(runs[0].values()), 3),
        "sf": sf,
    }
    print(json.dumps(result))
    # per-query history for round-over-round regression tracking (append-only;
    # see tools/bench_history.py for the diff report)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **result}) + "\n")
    except OSError:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
