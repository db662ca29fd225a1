"""Round-10 registry candidates — (Spark query, DuckDB oracle) pairs
built and oracle-validated in round 8's continuation windows, held out
of BOTH `registry.REGISTRY` and `registry_r9.CANDIDATES`: the round-9
driver window is exactly budgeted by the 49 r9 candidates (see
COVERAGE.md), so work beyond that budget starts the round-10 pool here,
the same device the r8->r9 handoff used. Registering in round 10 is
mechanical: absorb CANDIDATES exactly as `registry._absorb_r8_candidates`
did.

Validation: `tests/test_r10_candidates.py` pins the non-registration and
runs every candidate through the selfcheck compare at sf0.001 AND
sf0.01 (the two-scale CI shape from day one).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from query_engine_spark.sources.testdata import load_table


@dataclass(frozen=True)
class CandidateSpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str
    doc: str = ""


CANDIDATES: dict[str, CandidateSpec] = {}


def _candidate(name: str, oracle: str, doc: str = ""):
    def deco(fn):
        CANDIDATES[name] = CandidateSpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# ---------------------------------------------------------------------------
# QOI: the exact-roundtrip image format modern ML tooling interchanges


@_candidate(
    "multimodal_qoi",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 9 + doc_id % 4 AS w, 8 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 96),
    px AS (
      SELECT m.media_id, m.w, m.h,
             CASE WHEN ((x.x // 3) + y.y) % 4 = 0
                  THEN (m.media_id * 31) % 256
                  ELSE (m.media_id * 31 + y.y * 7 + x.x * 3) % 256
             END AS base,
             CASE WHEN ((x.x // 3) + y.y) % 4 = 0 THEN 255
                  WHEN m.media_id % 4 = 0 THEN (m.media_id + x.x) % 256
                  ELSE 255
             END AS a
      FROM m, generate_series(0, 12) AS x(x), generate_series(0, 10) AS y(y)
      WHERE x.x < m.w AND y.y < m.h)
    SELECT media_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(CASE WHEN media_id % 4 = 0 THEN 4 ELSE 3 END AS INT) AS channels,
           CAST(sum(base) AS BIGINT) AS r_sum,
           CAST(sum((base + 11) % 256) AS BIGINT) AS g_sum,
           CAST(sum((base + 22) % 256) AS BIGINT) AS b_sum,
           CAST(sum(a) AS BIGINT) AS a_sum
    FROM px GROUP BY media_id
    """,
    "QOI DECODE, hash-verified — the 'Quite OK Image' exact-roundtrip "
    "format modern ML tooling interchanges: all five op kinds (RUN / "
    "64-slot hash INDEX / wraparound DIFF / LUMA / RGB(A)) over running "
    "previous-pixel state, with flat patches forcing runs, revisited "
    "colors forcing index hits, small gradients forcing DIFF/LUMA, and "
    "alpha-varying streams on every fourth id; the end marker is "
    "verified and truncation raises. The oracle recomputes every "
    "channel sum from the fixture formulas "
    "(llmdata/multimodal.py encode_qoi/decode_qoi/qoi_features)",
)
def multimodal_qoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.registry_r9 import _pack_media

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 96).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(ids, lambda i: MM.make_qoi(i, 9 + i % 4, 8 + i % 3))
    return MM.qoi_features(media)


# ---------------------------------------------------------------------------
# FITS: the astronomy-corpus raster


@_candidate(
    "multimodal_fits",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             ([8, 16, 32])[1 + doc_id % 3] AS bp,
             11 + doc_id % 5 AS w, 9 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 96),
    px AS (
      SELECT m.media_id, m.w, m.h, m.bp,
             (m.media_id * 131 + y.y * 17 + x.x * 5)
               % (1::BIGINT << m.bp)
               - CASE WHEN m.bp > 8 THEN (1::BIGINT << (m.bp - 1)) ELSE 0 END
               AS v
      FROM m, generate_series(0, 15) AS x(x), generate_series(0, 12) AS y(y)
      WHERE x.x < m.w AND y.y < m.h)
    SELECT media_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(max(bp) AS INT) AS bitpix,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM px GROUP BY media_id
    """,
    "FITS DECODE, hash-verified — the astronomy-corpus raster (NASA "
    "FITS 4.0, public): 80-char header cards in 2880-byte blocks, "
    "big-endian signed pixel data at BITPIX 8/16/32 cycling by id, "
    "2880-padding walked exactly. Floating BITPIX refuses (cross-engine "
    "float hashing is the repo's no-go), as do extensions and "
    "NAXIS != 2. The oracle recomputes every signed pixel from the "
    "construction formula (llmdata/multimodal.py "
    "make_fits/decode_fits/fits_features)",
)
def multimodal_fits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.registry_r9 import _pack_media

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 96).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(
        ids,
        lambda i: MM.make_fits(
            i, 11 + i % 5, 9 + i % 4, bitpix=(8, 16, 32)[i % 3]
        ),
    )
    return MM.fits_features(media)
