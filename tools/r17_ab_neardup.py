"""Same-session interleaved A/B for llm_curation_pipeline_neardup's
classifier tail: the r16 shape (train + score each tokenize + md5-bucket the
corpus independently) vs the r17 shared-tokenization shape (one persisted
(doc_id, __pos, bkt) per-token table feeding both groupBys via the
`bucketed` hooks). The OLD pipeline.py is loaded side-by-side from git
(`git show`) so both variants run in one session against the same testdata.
Timing = construction + noop write (dedup_clusters localCheckpoints are
eager — construction does real work). Parity collect-verified first."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SPEC = [
    {"op": "dedup_minhash", "n_hashes": 8, "bands": 4, "threshold": 0.1, "keep": "best"},
    {"op": "classifier_filter", "label_min_quality": 0.5, "min_score_q": 0},
]


def load_old_pipeline(ref: str = "HEAD"):
    src = subprocess.run(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", f"{ref}:query_engine_spark/llmdata/pipeline.py"],
        check=True, capture_output=True, text=True,
    ).stdout
    spec = importlib.util.spec_from_loader("old_pipeline", loader=None)
    mod = importlib.util.module_from_spec(spec)
    exec(compile(src, f"<{ref}:pipeline.py>", "exec"), mod.__dict__)
    return mod


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))
    ref = os.environ.get("AB_OLD_REF", "HEAD")

    from query_engine_spark.session import get_spark
    from query_engine_spark.sources.testdata import load_table
    from query_engine_spark.llmdata import clear_llmdata_cache
    from query_engine_spark.llmdata import pipeline as new_pipeline
    from query_engine_spark import registry

    old_pipeline = load_old_pipeline(ref)
    spark = get_spark("r17_ab_neardup")
    seeds, bands = registry._MINHASH_SEEDS, registry._MINHASH_BANDS
    full_spec = [
        {"op": "dedup_minhash", "n_hashes": seeds, "bands": bands,
         "threshold": 0.1, "keep": "best"},
        {"op": "classifier_filter", "label_min_quality": 0.5, "min_score_q": 0},
    ]

    def build(mod):
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        run = mod.translate_curation_pipeline(full_spec)
        return (
            run(docs)
            .select("doc_id", "source", F.md5(F.encode("text", "utf-8")).alias("fp"))
            .orderBy("doc_id")
        )

    ra = sorted(map(tuple, build(old_pipeline).collect())); clear_llmdata_cache()
    rb = sorted(map(tuple, build(new_pipeline).collect())); clear_llmdata_cache()
    assert ra == rb, f"PARITY FAIL: {len(ra)} vs {len(rb)}"
    print(f"parity OK: {len(ra)} rows identical")

    def timed(mod) -> float:
        t0 = time.time()
        build(mod).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        clear_llmdata_cache()
        return dt

    timed(old_pipeline)  # warmup
    times = {"old (2 tokenizations)": [], "new (shared bucketed)": []}
    for _ in range(n):
        times["old (2 tokenizations)"].append(timed(old_pipeline))
        times["new (shared bucketed)"].append(timed(new_pipeline))
    for k, ts in times.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t, 3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
