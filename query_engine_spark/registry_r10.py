"""Round-10 registry queries — (Spark query, DuckDB oracle) pairs
REGISTERED into `registry.REGISTRY` in round 10 (they lead the driver
window as never-verified): QOI and FITS (built in round 8's
continuation windows), the five least-user-frequent round-9 candidates
moved here in round 9 to buy driver-window re-verification slots
(subtitles / PNM / SVG / AU / WOFF), and the round-9-built
sniff->decoder dispatch stage. Registration happens through the
end-of-module `_absorb_r10_candidates` callback, the same import-order-
safe shape as registry_r8/_r9 (see registry._absorb_r8_candidates for
the circular-import rationale).

Validation: `tests/test_r10_candidates.py` pins the registration and
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


def _pack_media(ids, maker):
    from query_engine_spark.registry_r9 import _pack_media as rp

    return rp(ids, maker)


# ---------------------------------------------------------------------------
# Moved from the round-9 pool (r8 verdict ask #2): the five least-user-
# frequent candidates, held one more round to free r9 driver-window slots
# for re-verifying the five r8-rewritten registered queries.

# ---------------------------------------------------------------------------
# Subtitles (SRT / WebVTT): the ASR-pair text shape


@_candidate(
    "multimodal_subtitles",
    """
    WITH m AS (
      SELECT doc_id AS i, 3 + doc_id % 4 AS n FROM documents WHERE doc_id < 96),
    cue AS (
      SELECT m.i, m.n, k.k,
             800 + (k.k * 97) % 1200 AS dur,
             'Cue ' || CAST(k.k AS VARCHAR) || ' of media ' || CAST(m.i AS VARCHAR)
             || CASE WHEN k.k % 2 = 0
                     THEN chr(10) || 'subtitle text ' || CAST(k.k % 5 AS VARCHAR)
                     ELSE '' END AS cuetext
      FROM m, generate_series(0, 6) AS k(k) WHERE k.k < m.n),
    j AS (
      SELECT i, max(n) AS n, CAST(sum(dur) AS BIGINT) AS total_ms,
             string_agg(cuetext, chr(12) ORDER BY k) AS full_text
      FROM cue GROUP BY i)
    SELECT i AS media_id, CAST(n AS INT) AS cues, total_ms,
           CAST(length(full_text) AS BIGINT) AS chars, md5(full_text) AS fp
    FROM j
    """,
    "SUBTITLE PARSING (SRT + WebVTT — the text half of every captioned "
    "video / ASR training pair): format auto-detected by the WEBVTT "
    "header, comma- vs dot-millisecond timestamps, BOMs, VTT NOTE "
    "blocks, cue ids, and cue settings after the arrow all exercised "
    "(odd media are full-hazard VTT, even are SRT); cue durations sum "
    "exactly and the md5 is over the cue texts with internal newlines "
    "preserved; backwards cues and malformed timestamps refuse "
    "(llmdata/multimodal.py make_subtitles/parse_subtitles/"
    "subtitle_stats)",
)
def multimodal_subtitles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 96).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_subtitles(i, 3 + i % 4).encode("utf-8")),
        media_type="text/vtt",
    )
    return MM.subtitle_stats(media)


# ---------------------------------------------------------------------------
# Netpbm (PNM): the dataset-interchange image family


@_candidate(
    "multimodal_pnm",
    """
    WITH m AS (
      SELECT doc_id AS media_id, doc_id % 6 AS v,
             7 + doc_id % 4 AS w, 5 + doc_id % 3 AS h
      FROM documents WHERE doc_id < 96),
    g AS (
      SELECT m.*,
             CASE WHEN m.v IN (0, 3) THEN 1
                  WHEN m.v IN (1, 4) AND m.media_id % 3 = 0 THEN 1000
                  ELSE 255 END AS maxval,
             CASE WHEN m.v IN (2, 5) THEN 3 ELSE 1 END AS chans
      FROM m),
    px AS (
      SELECT g.media_id, g.w, g.h, g.maxval, g.chans,
             CASE WHEN g.v IN (0, 3)
                  THEN (g.media_id*31 + y.y*7 + x.x*3) % 2
                  ELSE (g.media_id*31 + y.y*7 + x.x*3 + c.c*11) % (g.maxval + 1)
             END AS s,
             x.x, y.y, c.c
      FROM g, generate_series(0, 10) AS x(x), generate_series(0, 7) AS y(y),
           generate_series(0, 2) AS c(c)
      WHERE x.x < g.w AND y.y < g.h AND c.c < g.chans)
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(chans AS INT) AS channels, CAST(maxval AS INT) AS maxval,
           CAST(sum(s) AS BIGINT) AS sample_sum,
           CAST(max(CASE WHEN x = 0 AND y = 0 AND c = 0 THEN s END) AS INT)
             AS top_left
    FROM px GROUP BY media_id, w, h, chans, maxval
    """,
    "Netpbm (PNM) DECODE, hash-verified — the dataset-interchange image "
    "family ML pipelines pass around: all six formats cycle by "
    "media_id (P1 separator-free ASCII bitmaps, P2/P3 ASCII gray/RGB, "
    "P4 MSB-first row-padded packed bits, P5/P6 binary — with a 1000 "
    "maxval on every third gray stream forcing 2-byte BIG-ENDIAN "
    "samples, the classic PNM reader mistake), '#' comments planted "
    "between header tokens. The oracle recomputes every sample from "
    "the construction formulas (llmdata/multimodal.py "
    "make_pnm/decode_pnm/pnm_features)",
)
def multimodal_pnm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 96).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(
        ids, lambda i: MM.make_pnm(i, 7 + i % 4, 5 + i % 3)
    )
    return MM.pnm_features(media)


# ---------------------------------------------------------------------------
# SVG structural metadata


@_candidate(
    "multimodal_svg",
    """
    WITH m AS (SELECT doc_id AS media_id FROM documents WHERE doc_id < 256)
    SELECT media_id,
           CAST(100 + media_id % 40 AS INT) AS width,
           CAST(80 + media_id % 30 AS INT) AS height,
           CAST(1 + media_id % 4 AS INT) AS n_paths,
           CAST(media_id % 3 AS INT) AS n_rects,
           CAST(1 + media_id % 2 AS INT) AS n_texts,
           CAST((1 + media_id % 2)
                * (8 + length(CAST(media_id AS VARCHAR)))
                + (media_id % 2) AS BIGINT) AS text_chars,
           'Icon ' || CAST(media_id AS VARCHAR) AS title
    FROM m
    """,
    "SVG STRUCTURAL METADATA, hash-verified — the web's vector-image "
    "format, parsed not rasterized (the curation signals are in the "
    "structure: px dimensions with viewBox fallback, an element census "
    "of paths/rects/texts, embedded text length, the <title>): "
    "namespaced ElementTree over deterministic fixtures with comments "
    "and nested <g> groups; non-pixel units (em/%/pt) refuse — "
    "resolving them honestly needs a renderer context. text_chars = "
    "n_texts * len('label {id}-k') + newline joins, recomputed by the "
    "oracle from the construction formulas (llmdata/multimodal.py "
    "make_svg/parse_svg/svg_features)",
)
def multimodal_svg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 256).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(ids, MM.make_svg)
    return MM.svg_features(media)


# ---------------------------------------------------------------------------
# Sun/NeXT AU audio: the legacy speech-corpus container


@_candidate(
    "multimodal_audio_au",
    """
    WITH m AS (SELECT doc_id AS media_id, 400 + doc_id % 5 * 60 AS n,
                      8000 + doc_id % 3 * 4000 AS rate
               FROM documents WHERE doc_id < 64),
    s AS (
      SELECT m.media_id, m.rate, m.n,
             ((m.media_id*131 + i.i*17) % 65536) - 32768 AS v
      FROM m, generate_series(0, 699) AS i(i) WHERE i.i < m.n)
    SELECT media_id, CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS amp_sum,
           CAST(max(v) AS INT) AS peak,
           CAST(((media_id*131) % 65536) - 32768 AS INT) AS first_sample
    FROM s GROUP BY media_id
    """,
    "Sun/NeXT AU decode, hash-verified — the legacy speech-corpus "
    "container (completes the PCM matrix alongside WAV/AIFF/SPHERE/"
    "FLAC): big-endian header with annotation-aware data offsets and "
    "the 0xFFFFFFFF unknown-size sentinel pipe-written files carry "
    "(every third fixture), 16-bit linear PCM BE; mu-law AU expands "
    "through the same G.711 table as the WAV path (unit-tested); other "
    "encodings refuse. Same shared PCM-container fold and oracle "
    "arithmetic as the sibling formats (llmdata/multimodal.py "
    "make_au/decode_au/au_features)",
)
def multimodal_audio_au(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_au(i, 400 + i % 5 * 60, 8000 + i % 3 * 4000)),
        media_type="audio/basic",
    )
    return MM.au_features(media)


# ---------------------------------------------------------------------------
# WOFF web fonts: the font asset class of every page crawl


@_candidate(
    "multimodal_woff",
    """
    SELECT doc_id AS media_id,
           'truetype' AS kind,
           CAST(3 AS INT) AS n_tables,
           CAST(10 + doc_id % 90 AS INT) AS num_glyphs,
           CAST(1000 + (doc_id % 4) * 24 AS INT) AS units_per_em,
           'Fixture' || chr(8201) || 'Sans ' || CAST(doc_id % 13 AS VARCHAR)
             AS family
    FROM documents WHERE doc_id < 256
    """,
    "WOFF 1.0 WEB FONTS, hash-verified — the font asset class of every "
    "page crawl, parsed for curation metadata without rendering: the "
    "W3C container header, the table directory with per-table zlib "
    "inflation (compLength < origLength means deflated), maxp's glyph "
    "count, head's magic-checked units-per-em, and the name table's "
    "family (UTF-16BE on platform 3 — the fixture family carries a "
    "THIN SPACE U+2009, written as an explicit escape on both engines "
    "per the repo's NFC-hazard convention, so a latin-1-everything "
    "parser fails the hash). WOFF2 refuses (brotli absent here) "
    "(llmdata/multimodal.py make_woff/parse_woff/woff_features)",
)
def multimodal_woff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 256).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(ids, MM.make_woff)
    return MM.woff_features(media)


def _jpeg_sql_parts() -> tuple[str, str, str]:
    """The dispatch oracle's JPEG fragment built from the SAME Python
    literals the decoder uses (_JPEG_IDCT_A/_JPEG_QTAB/_JPEG_ZIGZAG),
    exactly as registry._jpeg_oracle() does — hand-copied constants
    would silently diverge if the shared literals or the rounding
    contract ever changed (review pass-2 finding)."""
    from query_engine_spark.llmdata.multimodal import (
        _JPEG_IDCT_A,
        _JPEG_QTAB,
        _JPEG_ZIGZAG,
    )

    a_rows = ", ".join(
        f"({u}, {x}, {_JPEG_IDCT_A[u][x]})" for u in range(8) for x in range(8)
    )
    used = [0, 1, 3, 8, 20, 40, 55]  # jpeg_qcoefs' nonzero zigzag indices
    cm_rows = ", ".join(
        f"({i}, {_JPEG_ZIGZAG[i] % 8}, {_JPEG_ZIGZAG[i] // 8}, {_JPEG_QTAB[i]})"
        for i in used
    )
    half, full = 1 << 25, 1 << 26
    fdiv = (
        f"((t + {half}) // {full}) - (CASE WHEN (t + {half}) % {full} != 0 "
        f"AND t + {half} < 0 THEN 1 ELSE 0 END)"
    )
    return a_rows, cm_rows, fdiv


_JPEG_A_ROWS, _JPEG_CM_ROWS, _JPEG_FDIV = _jpeg_sql_parts()


# ---------------------------------------------------------------------------
# sniff -> decoder dispatch: the composed triage + decode stage (built in
# round 9 per the r8 verdict's "extend media_type_sniff into the ingest
# path" ask; pooled here because the round-9 driver window is exactly full)


@_candidate(
    "media_decode_dispatch",
    """
    WITH ids AS (SELECT doc_id AS media_id, doc_id % 10 AS sel
                 FROM documents WHERE doc_id < 320),
    -- JPEG rows (sel 0): the verified coefficient-formula IDCT replay
    jm AS (
      SELECT media_id, 2 + media_id % 2 AS bw, 2 + (media_id // 2) % 2 AS bh
      FROM ids WHERE sel = 0),
    jblocks AS (
      SELECT media_id, bw, bh, b.b AS bi
      FROM jm, generate_series(0, 8) AS b(b) WHERE b.b < bw * bh),
    cm(zi, cu, cv, q) AS (VALUES """ + _JPEG_CM_ROWS + """),
    jcoefs AS (
      SELECT media_id, bw, bh, bi, cm.cu, cm.cv,
             (CASE WHEN cm.zi = 0 THEN ((media_id*7 + bi*5) % 13) - 6
                   ELSE ((media_id*11 + bi*3 + cm.zi) % 9) - 4 END) * cm.q AS cq
      FROM jblocks, cm),
    a(au, ax, aval) AS (VALUES """ + _JPEG_A_ROWS + """),
    jterms AS (
      SELECT c.media_id, c.bw, c.bh, c.bi, px.x AS x, py.y AS y,
             CAST(sum(c.cq * aa.aval * ab.aval) AS BIGINT) AS t
      FROM jcoefs c, generate_series(0, 7) AS px(x), generate_series(0, 7) AS py(y)
      JOIN a aa ON aa.au = c.cu AND aa.ax = px.x
      JOIN a ab ON ab.au = c.cv AND ab.ax = py.y
      GROUP BY 1, 2, 3, 4, 5, 6),
    jpix AS (
      SELECT media_id, bw, bh,
             greatest(0, least(255, 128 + """ + _JPEG_FDIV + """)) AS p
      FROM jterms),
    jpeg_rows AS (
      SELECT media_id, 'image/jpeg' AS mtype, CAST(bw * 8 AS INT) AS width,
             CAST(bh * 8 AS INT) AS height, CAST(NULL AS BIGINT) AS n_samples,
             CAST(sum(p) AS BIGINT) AS content_sum
      FROM jpix GROUP BY 1, 2, 3, 4),
    -- PNG rows (sel 1): formula pixels, 3 channels
    png_rows AS (
      SELECT i.media_id, 'image/png' AS mtype,
             CAST(4 + i.media_id % 5 AS INT) AS width,
             CAST(3 + i.media_id % 4 AS INT) AS height,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(SUM((i.media_id*31 + y.y*7 + x.x*3 + c.c) % 256) AS BIGINT)
               AS content_sum
      FROM ids i, generate_series(0, 6) AS y(y), generate_series(0, 8) AS x(x),
           generate_series(0, 2) AS c(c)
      WHERE i.sel = 1 AND y.y < 3 + i.media_id % 4 AND x.x < 4 + i.media_id % 5
      GROUP BY 1, 2, 3, 4),
    -- GIF rows (sel 2): palette-resolved rgb sum
    gif_rows AS (
      SELECT media_id, 'image/gif' AS mtype, CAST(w AS INT) AS width,
             CAST(h AS INT) AS height, CAST(NULL AS BIGINT) AS n_samples,
             CAST(SUM(idx + (idx*3) % 256 + (idx*7) % 256) AS BIGINT)
               AS content_sum
      FROM (
        SELECT i.media_id, 28 + i.media_id % 5 AS w, 18 + i.media_id % 4 AS h,
               (i.media_id*31 + y.y*7 + x.x*3) % 256 AS idx
        FROM ids i, generate_series(0, 21) AS y(y), generate_series(0, 32) AS x(x)
        WHERE i.sel = 2 AND y.y < 18 + i.media_id % 4 AND x.x < 28 + i.media_id % 5)
      GROUP BY 1, 2, 3, 4),
    -- WebP lossless rows (sel 3): ARGB formula, R+G+B summed
    webp_rows AS (
      SELECT i.media_id, 'image/webp' AS mtype,
             CAST(9 + i.media_id % 4 AS INT) AS width,
             CAST(8 + i.media_id % 3 AS INT) AS height,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(SUM((i.media_id*31 + y.y*7 + x.x*3 + c.c*11) % 256) AS BIGINT)
               AS content_sum
      FROM ids i, generate_series(0, 12) AS y(y), generate_series(0, 12) AS x(x),
           generate_series(0, 2) AS c(c)
      WHERE i.sel = 3 AND y.y < 8 + i.media_id % 3 AND x.x < 9 + i.media_id % 4
      GROUP BY 1, 2, 3, 4),
    -- WAV rows (sel 4): PCM16 amplitude sum
    wav_rows AS (
      SELECT i.media_id, 'audio/wav' AS mtype, CAST(NULL AS INT) AS width,
             CAST(NULL AS INT) AS height,
             CAST(600 + (i.media_id % 7) * 100 AS BIGINT) AS n_samples,
             CAST(SUM(((i.media_id*131 + k.k*17) % 65536) - 32768) AS BIGINT)
               AS content_sum
      FROM ids i, generate_series(0, 1199) AS k(k)
      WHERE i.sel = 4 AND k.k < 600 + (i.media_id % 7) * 100
      GROUP BY 1, 2, 3, 4, 5),
    -- TIFF rows (sel 5): grayscale formula
    tiff_rows AS (
      SELECT i.media_id, 'image/tiff' AS mtype,
             CAST(9 + i.media_id % 4 AS INT) AS width,
             CAST(8 + i.media_id % 3 AS INT) AS height,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(SUM((i.media_id*31 + y.y*7 + x.x*3) % 256) AS BIGINT)
               AS content_sum
      FROM ids i, generate_series(0, 12) AS y(y), generate_series(0, 12) AS x(x)
      WHERE i.sel = 5 AND y.y < 8 + i.media_id % 3 AND x.x < 9 + i.media_id % 4
      GROUP BY 1, 2, 3, 4),
    -- BMP rows (sel 6): 24-bpp formula
    bmp_rows AS (
      SELECT i.media_id, 'image/bmp' AS mtype,
             CAST(4 + i.media_id % 5 AS INT) AS width,
             CAST(3 + i.media_id % 4 AS INT) AS height,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(SUM((i.media_id*31 + y.y*7 + x.x*3 + c.c) % 256) AS BIGINT)
               AS content_sum
      FROM ids i, generate_series(0, 6) AS y(y), generate_series(0, 8) AS x(x),
           generate_series(0, 2) AS c(c)
      WHERE i.sel = 6 AND y.y < 3 + i.media_id % 4 AND x.x < 4 + i.media_id % 5
      GROUP BY 1, 2, 3, 4),
    -- lossy VP8 (sel 7) and animated VP8X (sel 8): sniff as
    -- image/webp, pixel decode is the documented boundary -> header
    -- dims with honest NULL content
    webp_nodecode_rows AS (
      SELECT media_id, 'image/webp' AS mtype,
             CAST(CASE WHEN sel = 7 THEN 16 + media_id % 13
                       ELSE 14 + media_id % 4 END AS INT) AS width,
             CAST(CASE WHEN sel = 7 THEN 16 + media_id % 9
                       ELSE 10 + media_id % 3 END AS INT) AS height,
             CAST(NULL AS BIGINT) AS n_samples,
             CAST(NULL AS BIGINT) AS content_sum
      FROM ids WHERE sel IN (7, 8)),
    -- junk rows (sel 9): sniffed unknown, everything NULL
    junk_rows AS (
      SELECT media_id, 'unknown' AS mtype, CAST(NULL AS INT) AS width,
             CAST(NULL AS INT) AS height, CAST(NULL AS BIGINT) AS n_samples,
             CAST(NULL AS BIGINT) AS content_sum
      FROM ids WHERE sel = 9)
    SELECT * FROM jpeg_rows UNION ALL SELECT * FROM png_rows
    UNION ALL SELECT * FROM gif_rows UNION ALL SELECT * FROM webp_rows
    UNION ALL SELECT media_id, mtype, width, height, n_samples, content_sum
      FROM wav_rows
    UNION ALL SELECT * FROM tiff_rows UNION ALL SELECT * FROM bmp_rows
    UNION ALL SELECT * FROM webp_nodecode_rows
    UNION ALL SELECT * FROM junk_rows
    """,
    "SNIFF -> DECODER DISPATCH, hash-verified — the composed ingest "
    "stage a crawl media pipeline actually runs: sniff_media_type "
    "classifies every payload as a PURE COLUMN EXPRESSION (codegen, "
    "scan speed), then ONE map-only Arrow pass routes each payload to "
    "its family decoder BY THE SNIFFED TYPE — JPEG (entropy decode + "
    "integer IDCT), PNG (inflate + unfilter), GIF (LZW + palette), "
    "lossless WebP (VP8L), WAV (PCM16), TIFF (strips), BMP — into one "
    "unified census schema (dims + content sum / sample count + "
    "amplitude sum), with honest NULLs for unknown payloads. A "
    "misrouted payload fails inside the family decoder instead of "
    "producing numbers from garbage. The oracle recomputes every "
    "family's content from its construction formulas, incl. the JPEG "
    "coefficient->IDCT replay (llmdata/multimodal.py sniff_media_type/"
    "decode_dispatch_features)",
)
def media_decode_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd

    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.llmdata import webp as WB

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 320)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                sel = i % 10
                if sel == 0:
                    b = MM.make_jpeg(i, 2 + i % 2, 2 + (i // 2) % 2)
                elif sel == 1:
                    b = MM.make_png(i, 4 + i % 5, 3 + i % 4)
                elif sel == 2:
                    b = MM.make_gif(i, 28 + i % 5, 18 + i % 4)
                elif sel == 3:
                    b = WB.make_webp(i, 9 + i % 4, 8 + i % 3)
                elif sel == 4:
                    b = MM.make_wav(i, 600 + (i % 7) * 100)
                elif sel == 5:
                    b = MM.make_tiff(i, 9 + i % 4, 8 + i % 3)
                elif sel == 6:
                    b = MM.make_bmp(i, 4 + i % 5, 3 + i % 4)
                elif sel == 7:
                    b = WB.make_webp_lossy(i, 16 + i % 13, 16 + i % 9)
                elif sel == 8:
                    b = WB.make_webp_animated(i)
                else:
                    b = bytes((i * 7 + k) % 251 + 1 for k in range(24))
                payloads.append(b)
            yield pd.DataFrame({"media_id": pdf["doc_id"], "payload": payloads})

    media = docs.select("doc_id").mapInPandas(pack, "media_id long, payload binary")
    sniffed = media.withColumn("mtype", MM.sniff_media_type(F.col("payload")))
    return MM.decode_dispatch_features(sniffed)


# ---------------------------------------------------------------------------
# Round-10 registration: fold the now-complete candidate dict into the main
# registry. This callback runs at the END of this module body so the main
# registry always absorbs the full set, whichever module leads the import
# (see registry._absorb_r10_candidates for the circular-import rationale).
from query_engine_spark import registry as _registry  # noqa: E402

_registry._absorb_r10_candidates(CANDIDATES)
