"""Declarative curation pipeline → ONE lazy DataFrame plan.

The llmdata analogue of `plans/blocks.py`: the reference translates a JSON
feed-block pipeline (input → filter → score → sort → limit) into a single
Catalyst plan; this module does the same for the training-data domain — a
JSON spec of curation stages folds the llmdata operator library into one
plan, so Catalyst sees the whole pipeline (filters merge, projections
prune, nothing materializes between stages).

Stage vocabulary (document-shaped until `chunk`, chunk-shaped until
`pack`, `pack` is terminal):

  {"op": "strip_boilerplate", "k": 2, "min_pct": 5, "min_count": 2}
  {"op": "dedup_exact"}
  {"op": "langid_filter", "allow": ["en"]}
  {"op": "quality_filter", "min_quality": 0.5}
  {"op": "chunk", "chunk_tokens": 32, "overlap": 4}
  {"op": "pack", "capacity": 128, "shards": 8}

Document stages preserve (doc_id, source, text); `strip_boilerplate`
replaces text with the prefix-stripped form. Unknown ops and out-of-order
stages (a document stage after `chunk`, anything after `pack`) raise at
TRANSLATE time — a mis-specified 100 TB pipeline must fail before it
launches, not after the first shuffle.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from query_engine_spark.llmdata import dedup as D
from query_engine_spark.llmdata import textstats as Tx
from query_engine_spark.llmdata.corpus import chunk_documents, pack_chunks

__all__ = ["translate_curation_pipeline", "quality_score_col", "CURATION_OPS"]

_DOC_OPS = ("strip_boilerplate", "dedup_exact", "langid_filter", "quality_filter")
CURATION_OPS = _DOC_OPS + ("chunk", "pack")


def quality_score_col(t: Column) -> Column:
    """`textstats.quality_features`' composite score as a single Column
    (same gates, same 6-digit ratio rounding) — lets a pipeline apply the
    quality gate as a pure row filter without materializing the feature
    table or joining back."""
    toks = Tx._tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    punct = F.length(F.regexp_replace(t, "[^.!?,;:]", ""))
    en_hits = F.size(F.filter(toks, lambda x: x.isin(*Tx.LANG_PROFILES["en"])))
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(en_hits / F.greatest(n_tok, F.lit(1)), 6)
    return F.round(
        F.when(n_tok >= 20, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((punct_ratio > 0.0) & (punct_ratio < 0.2), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.05, F.lit(0.3)).otherwise(F.lit(0.0)),
        2,
    )


def translate_curation_pipeline(
    spec: Sequence[dict],
) -> Callable[[DataFrame], DataFrame]:
    """Validate `spec` and return a function folding a documents DataFrame
    (doc_id, source, text, ...) through every stage as one lazy plan."""
    shape = "docs"
    for i, stage in enumerate(spec):
        op = stage.get("op")
        if op not in CURATION_OPS:
            raise ValueError(f"stage {i}: unknown op {op!r} (known: {CURATION_OPS})")
        if shape == "packed":
            raise ValueError(f"stage {i}: {op!r} after terminal 'pack'")
        if op in _DOC_OPS and shape != "docs":
            raise ValueError(f"stage {i}: document stage {op!r} after 'chunk'")
        if op == "chunk" and shape != "docs":
            raise ValueError(f"stage {i}: 'chunk' requires document shape (got a second 'chunk'?)")
        if op == "pack" and shape != "chunks":
            raise ValueError(f"stage {i}: 'pack' requires a preceding 'chunk'")
        shape = {"chunk": "chunks", "pack": "packed"}.get(op, shape)

    def run(df: DataFrame) -> DataFrame:
        for stage in spec:
            op = stage["op"]
            if op == "strip_boilerplate":
                out = Tx.strip_boilerplate(
                    df,
                    k=stage.get("k", 2),
                    min_pct=stage.get("min_pct", 5),
                    min_count=stage.get("min_count", 2),
                )
                df = out.select("doc_id", "source", F.col("clean_text").alias("text"))
            elif op == "dedup_exact":
                df = D.exact_dedup(df, text_col="text", id_col="doc_id")
            elif op == "langid_filter":
                allow = list(stage.get("allow", ["en"]))
                df = df.filter(Tx.langid(F.col("text")).isin(allow))
            elif op == "quality_filter":
                df = df.filter(
                    quality_score_col(F.col("text")) >= stage.get("min_quality", 0.5)
                )
            elif op == "chunk":
                df = chunk_documents(
                    df,
                    chunk_tokens=stage.get("chunk_tokens", 128),
                    overlap=stage.get("overlap", 16),
                )
            elif op == "pack":
                df = pack_chunks(
                    df,
                    capacity=stage.get("capacity", 512),
                    shards=stage.get("shards", 32),
                )
        return df

    return run
