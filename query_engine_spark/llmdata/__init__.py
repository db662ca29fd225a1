"""Large-scale training-data operators (SURVEY §7 scale extensions).

Not part of the reference's surface — these are the operations a 100 TB
training-data pipeline needs, built Spark-first so they inherit partitioned
execution: exact + near dedup (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + IVF), text analysis
(language-ID, quality, tokens, fingerprints), and multimodal column plumbing.

Determinism contract: every hash used here is md5 (or arithmetic on md5 hex),
so results are engine-portable — the DuckDB oracle reproduces them bit-for-bit.
"""

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that records the DataFrame so a long-lived driver can free
    the cached blocks after materializing results (round-1 advice: the
    banded/signature intermediates leaked across calls)."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def clear_llmdata_cache() -> None:
    """Unpersist every intermediate cached by the llmdata operators. Call
    after collecting a query's result (bench/selfcheck do)."""
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass
