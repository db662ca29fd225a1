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

# entries are DataFrames (unpersist) or zero-arg cleanup callables
_PERSISTED: list = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that records the DataFrame so a long-lived driver can free
    the cached blocks after materializing results (round-1 advice: the
    banded/signature intermediates leaked across calls)."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def tracked(df: DataFrame) -> DataFrame:
    """Record an ALREADY-cached DataFrame (persisted or checkpointed
    elsewhere) for cleanup without re-persisting it."""
    _PERSISTED.append(df)
    return df


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint() whose cached RDD blocks are freed by
    clear_llmdata_cache(). DataFrame.unpersist() cannot reach a checkpoint's
    RDD blocks (they belong to the materialized RDD, not the Dataset), so the
    newly-persistent RDD ids are diffed around the eager checkpoint and
    unpersisted explicitly on cleanup — round-2 advice: these blocks
    accumulated until JVM GC, the very leak tracked_persist was added to fix."""
    jsc = df.sparkSession.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint()  # eager: the RDD is persistent on return
    after = jsc.getPersistentRDDs()
    new_ids = [i for i in after.keySet().toArray() if i not in before]
    rdds = [after.get(i) for i in new_ids]

    def _free(rdds=rdds):
        for r in rdds:
            r.unpersist()

    _PERSISTED.append(_free)
    return out


def clear_llmdata_cache() -> None:
    """Unpersist every intermediate cached by the llmdata operators. Call
    after collecting a query's result (bench/selfcheck do)."""
    while _PERSISTED:
        item = _PERSISTED.pop()
        try:
            item() if callable(item) else item.unpersist()
        except Exception:
            pass
