"""Scaled-input perf probe (r16 verdict item 8): sf0.1 is per-stage-
overhead-bound (the 8-core suite matches the 32-core suite), so skew and
scaling work has no measurable local target. This tool DERIVES a larger
input from sf0.1 deterministically — FACTOR disjoint replicas of the
documents / embeddings / events tables — times the heaviest queries on it
with the bench methodology (noop sink, min of N passes, tracked cache
cleared between queries, calibration anchor), and appends one record to
BENCH_HISTORY_sf1.jsonl (separate history, same min-fold rules).

Replication keeps workloads LINEAR in the factor:
  - documents: doc_id += r*10^7; every word of replica r>0 is prefixed
    `q<r>` (regexp, deterministic), so shingles/tokens/fingerprints are
    DISJOINT across replicas — near-dup and shingle-join work scales ~r,
    not r² (identical replica texts would cross-match and measure a
    quadratic workload that 100 TB corpora do not have); n_chars is
    recomputed from the new text.
  - embeddings: vec_id += r*10^7; each component += r*0.001 (replicas are
    near but not exact duplicates — cluster structure preserved).
  - events: event_id += r*10^9 (multiple of 25: the graph queries'
    `event_id % 25` destination distribution is preserved per replica),
    user_id += r*10^7 (disjoint node/user sets), ts cast to TIMESTAMP_NS
    so the parquet physical type matches the driver fixtures' NANOS
    convention that load_table expects.
Remaining tables are copied as-is. Everything is generated fresh into a
temp dir each invocation (nothing persisted across runs; queries compute
from the parquet inputs exactly like bench.py).

Usage: SPARK_GRAFT_CPUS=32 python tools/bench_sfx.py [factor] [query ...]
  factor default 10; queries default to the 10 heaviest bench lines.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# text_tfidf_pairs is deliberately ABSENT: the synthetic corpus has a
# ~31-word vocabulary, so at factor 10 its candidate-pair upper bound is
# 2.2e9 and the operator's in-plan max_pairs assert fires (loudly, BEFORE
# the term-keyed shuffle — the guard working as designed; see its
# docstring). That is a fixture property, not a workload this probe can
# measure meaningfully.
HEAVY10 = [
    "llm_curation_pipeline_neardup",
    "dedup_simhash",
    "embed_semdedup",
    "llm_curation_flags",
    "dedup_ngram_jaccard",
    "llm_stupid_backoff",
    "graph_pagerank",
    "text_repetition_features",
    "llm_bpe_train",
    "dedup_minhash_lsh",
]

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def generate(src: str, dst: str, factor: int) -> None:
    import duckdb

    con = duckdb.connect()
    rep = f"(SELECT unnest(range({factor})) AS __r)"
    con.execute(
        f"""COPY (
          SELECT d.doc_id + __r * 10000000 AS doc_id,
                 CASE WHEN __r = 0 THEN d.text
                      ELSE regexp_replace(d.text, '([A-Za-z0-9]+)',
                                          'q' || __r || '\\1', 'g') END AS text,
                 d.lang, d.source,
                 length(CASE WHEN __r = 0 THEN d.text
                      ELSE regexp_replace(d.text, '([A-Za-z0-9]+)',
                                          'q' || __r || '\\1', 'g') END) AS n_chars
          FROM read_parquet('{src}/documents.parquet') d CROSS JOIN {rep}
        ) TO '{dst}/documents.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT e.vec_id + __r * 10000000 AS vec_id,
                 list_transform(e.embedding, x -> x + __r * 0.001) AS embedding,
                 e.label
          FROM read_parquet('{src}/embeddings.parquet') e CROSS JOIN {rep}
        ) TO '{dst}/embeddings.parquet' (FORMAT parquet)"""
    )
    con.execute(
        f"""COPY (
          SELECT ev.event_id + __r * 1000000000 AS event_id,
                 CAST(ev.ts AS TIMESTAMP_NS) AS ts,
                 ev.user_id + __r * 10000000 AS user_id,
                 ev.event_type, ev.value, ev.props
          FROM read_parquet('{src}/events.parquet') ev CROSS JOIN {rep}
        ) TO '{dst}/events.parquet' (FORMAT parquet)"""
    )
    for t in ALL_TABLES:
        if t not in ("documents", "embeddings", "events"):
            shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or HEAVY10
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from query_engine_spark.session import get_spark
    from query_engine_spark import registry
    from query_engine_spark.llmdata import clear_llmdata_cache
    import bench

    tmp = tempfile.mkdtemp(prefix=f"sfx{factor}_")
    t0 = time.time()
    generate(src, tmp, factor)
    print(f"generated factor-{factor} inputs in {time.time() - t0:.1f}s at {tmp}")

    spark = get_spark("bench_sfx")
    spark.range(1).count()
    runs: list[dict[str, float]] = []
    for _ in range(n_runs):
        timings: dict[str, float] = {}
        for name in names:
            spec = registry.REGISTRY[name]
            q0 = time.time()
            spec.fn(spark, tmp).write.format("noop").mode("overwrite").save()
            timings[name] = time.time() - q0
            clear_llmdata_cache()
        runs.append(timings)
    best = {n: round(min(r[n] for r in runs), 3) for n in names}
    calibration = bench._calibration(spark)

    rec = {
        "ts": int(time.time()),
        "metric": f"heavy_queries_total_wall_x{factor}",
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "n_runs": n_runs,
        "action": "noop_write",
        "factor": factor,
        "base_sf_dir": src,
        "calibration_sec": calibration,
    }
    hist = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_HISTORY_sf1.jsonl")
    # min-fold against prior same-factor sessions, bench.py rules
    best_ever = dict(best)
    try:
        with open(hist) as f:
            for line in f:
                if not line.strip():
                    continue
                old = json.loads(line)
                if old.get("factor") != factor or old.get("action") != "noop_write":
                    continue
                for q, t in old.get("queries", {}).items():
                    if q in best_ever:
                        best_ever[q] = min(best_ever[q], t)
    except OSError:
        pass
    rec["queries_best_ever"] = best_ever
    rec["best_ever_total"] = round(sum(best_ever.values()), 3)
    with open(hist, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
