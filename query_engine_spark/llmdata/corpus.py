"""End-to-end training-corpus preparation: the composition a 100 TB data
pipeline actually runs, as one lazy DataFrame chain.

    gate (language + quality)  →  exact dedup  →  near-dup canonicalization

Each stage reuses the scale-shaped primitives (langid_ngram_table's broadcast
profile join, quality_features' pure column exprs, exact_dedup's one
fingerprint-keyed shuffle, MinHash-LSH's banded candidate join, and the
checkpointed label-propagation clustering). The near-dup stage runs on the
already-gated/exact-deduped survivors, so its candidate join sees the
smallest possible corpus — the stage order IS the optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from query_engine_spark.llmdata import dedup as D
from query_engine_spark.llmdata import textstats as Tx

__all__ = ["prepare_corpus"]


def prepare_corpus(
    df: DataFrame,
    *,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.7,
    n_hashes: int = 16,
    bands: int = 4,
    jaccard: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns the kept documents as (id_col, lang_pred, quality).

    Keep rules, in order:
    1. predicted language ∈ `langs` (char-trigram profile join);
    2. composite quality ≥ `min_quality` (length/punct/stopword gates);
    3. exact dedup — lowest id per normalized-text fingerprint survives;
    4. near-dup dedup — MinHash-LSH pairs at `jaccard` threshold, connected
       components, only each cluster's minimum id survives.
    """
    lang = Tx.langid_ngram_table(df, text_col, id_col).filter(F.col("lang_pred").isin(*langs))
    qual = Tx.quality_features(df, text_col, id_col).filter(F.col("quality") >= min_quality)
    gated = (
        df.join(lang, id_col, "inner")
        .join(qual.select(id_col, "quality"), id_col, "inner")
    )
    from query_engine_spark.llmdata import tracked_persist

    # `exact` feeds both the near-dup stage and the final anti-join — persist
    # so the gate+dedup chain runs once
    exact = tracked_persist(D.exact_dedup(gated, text_col, id_col))
    pairs = D.minhash_dedup_pairs(exact, text_col, id_col, n_hashes=n_hashes, bands=bands, threshold=jaccard)
    clusters = D.dedup_clusters(pairs)
    # non-canonical members (id != cluster min) drop out; docs in no cluster stay
    losers = clusters.filter(F.col("id") != F.col("cluster")).select(F.col("id").alias(id_col))
    kept = exact.join(losers, id_col, "left_anti")
    return kept.select(id_col, "lang_pred", "quality")
