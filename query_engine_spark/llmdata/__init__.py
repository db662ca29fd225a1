"""Large-scale training-data operators (SURVEY §7 scale extensions).

Not part of the reference's surface — these are the operations a 100 TB
training-data pipeline needs, built Spark-first so they inherit partitioned
execution: exact + near dedup (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, tokens, fingerprints), and multimodal column plumbing.

Determinism contract: every hash used here is md5 (or arithmetic on md5 hex),
so results are engine-portable — the DuckDB oracle reproduces them bit-for-bit.
"""

from query_engine_spark.cache import (  # noqa: F401 — re-exports
    clear_tracked_cache,
    tracked,
    tracked_local_checkpoint,
    tracked_persist,
)

# back-compat alias: bench/selfcheck call this between queries
clear_llmdata_cache = clear_tracked_cache
