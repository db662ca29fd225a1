"""Round-8 registry candidates — (Spark query, DuckDB oracle) pairs built
and ORACLE-VALIDATED in round 7, held out of `registry.REGISTRY` only
because the round-7 driver window was budgeted for the r1/r2 rotation
cohort (see `_ROUND7_TOUCHED`). Registering in round 8 is mechanical:
move each entry through `registry._register` (they will lead the window
as never-verified queries).

Validation today: `tests/test_r8_oracles.py` runs every candidate through
the same compare as `tools/selfcheck.py` (sorted columns/rows, dtype
checks, exact values) at sf0.001 — so the oracles carry no registration
risk into round 8.

Oracle strategy notes:
- progressive / restart JPEG reuse the EXISTING baseline oracles verbatim
  — the entropy transport changes, the decoded pixels do not (that is the
  whole design of the fixed-point decoder contract).
- 4:2:2 adapts the 4:2:0 oracle's geometry: Y grid 2·mw × mh, chroma
  upsample map (gx div 2, gy).
- the audio containers (FLAC mono/stereo, AIFF, SPHERE) share
  `make_wav`'s sample formula, so ONE SQL form covers all four; the
  stereo fixture interleaves the same formula stream, so its features
  equal the mono form at 2n samples.
- TIFF reuses the BMP/GIF pixel formula — compression (none / PackBits /
  early-change LZW) and byte order are transport, cycled by doc_id so the
  driver path exercises all six combinations.
- WARC ingest's oracle rebuilds the EXPECTED extracted text by string
  concatenation from the deterministic page template — predicting the
  html_to_text output from first principles rather than replaying the
  regex pipeline.
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


def _pack_media(ids: DataFrame, maker) -> DataFrame:
    from query_engine_spark.registry import _pack_media as rp

    return rp(ids, maker)


# ---------------------------------------------------------------------------
# JPEG family: transport variants of verified oracles


def _progressive_oracle() -> str:
    from query_engine_spark.registry import _jpeg_color_oracle

    return _jpeg_color_oracle()


@_candidate(
    "multimodal_jpeg_progressive",
    _progressive_oracle(),
    "PROGRESSIVE (SOF2) color JPEG decode: the default multi-scan script "
    "(spectral selection, EOB runs, DC+AC successive approximation) over "
    "the SAME jpeg_color_qcoefs coefficients as multimodal_jpeg_color — "
    "the oracle is that query's verbatim, because progressive transport "
    "must reconstruct identical pixels (llmdata/multimodal.py "
    "encode_jpeg_progressive/_decode_jpeg_progressive)",
)
def multimodal_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))

    def maker(i: int) -> bytes:
        bw, bh = 2 + i % 2, 2 + (i // 2) % 2
        blocks = {
            c: [MM.jpeg_color_qcoefs(i, bi, c) for bi in range(bw * bh)]
            for c in range(3)
        }
        return MM.encode_jpeg_progressive(blocks, bw, bh)

    media = MM.attach_media_meta(_pack_media(ids, maker), media_type="image/jpeg")
    return MM.jpeg_color_features(media)


def _restart_oracle() -> str:
    from query_engine_spark.registry import _jpeg_oracle

    return _jpeg_oracle()


@_candidate(
    "multimodal_jpeg_restart",
    _restart_oracle(),
    "baseline grayscale JPEG with RESTART INTERVALS (DRI + RSTn markers, "
    "modulo-8 sequence, DC-predictor resets) over the same jpeg_qcoefs "
    "coefficients as multimodal_jpeg — markers are transport, so that "
    "query's oracle applies verbatim",
)
def multimodal_jpeg_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))

    def maker(i: int) -> bytes:
        bw, bh = 2 + i % 2, 2 + (i // 2) % 2
        blocks = [MM.jpeg_qcoefs(i, bi) for bi in range(bw * bh)]
        return MM.encode_jpeg_blocks(blocks, bw, bh, restart_interval=1 + i % 3)

    media = MM.attach_media_meta(_pack_media(ids, maker), media_type="image/jpeg")
    return MM.jpeg_features(media)


def _jpeg_422_oracle() -> str:
    """The 4:2:0 oracle's geometry adapted to 2×1 luma: Y-block grid
    2·mw × mh, chroma at (gx div 2, gy), image mw·16 × mh·8."""
    from query_engine_spark.llmdata.multimodal import (
        _JPEG_IDCT_A,
        _JPEG_QTAB,
        _JPEG_QTAB_C,
        _JPEG_ZIGZAG,
    )

    a_rows = ", ".join(
        f"({u}, {x}, {_JPEG_IDCT_A[u][x]})" for u in range(8) for x in range(8)
    )
    used = [0, 1, 3, 8, 20, 40, 55]
    cmap = ", ".join(
        f"({i}, {_JPEG_ZIGZAG[i] % 8}, {_JPEG_ZIGZAG[i] // 8}, "
        f"{_JPEG_QTAB[i]}, {_JPEG_QTAB_C[i]})"
        for i in used
    )
    half, full = 1 << 25, 1 << 26
    fd = (
        f"((t + {half}) // {full}) - (CASE WHEN (t + {half}) % {full} != 0 "
        f"AND t + {half} < 0 THEN 1 ELSE 0 END)"
    )

    def fd16(v: str) -> str:
        return (
            f"(({v} + 32768) // 65536) - (CASE WHEN ({v} + 32768) % 65536 != 0 "
            f"AND {v} + 32768 < 0 THEN 1 ELSE 0 END)"
        )

    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, 1 + doc_id % 2 AS mw, 1 + (doc_id // 2) % 2 AS mh
      FROM documents WHERE doc_id < 48),
    cm(zi, cu, cv, q0, q1) AS (VALUES {cmap}),
    a(au, ax, aval) AS (VALUES {a_rows}),
    yb AS (
      SELECT media_id, mw, mh, b.b AS bi
      FROM m, generate_series(0, 7) AS b(b) WHERE b.b < 2 * mw * mh),
    ycoefs AS (
      SELECT media_id, mw, mh, bi, cm.cu, cm.cv,
             (CASE WHEN cm.zi = 0 THEN ((media_id*7 + bi*5) % 13) - 6
                   ELSE ((media_id*11 + bi*3 + cm.zi) % 9) - 4 END) * cm.q0 AS cq
      FROM yb, cm),
    yterms AS (
      SELECT c.media_id, c.mw, c.mh, c.bi, px.x AS x, py.y AS y,
             CAST(sum(c.cq * aa.aval * ab.aval) AS BIGINT) AS t
      FROM ycoefs c, generate_series(0, 7) AS px(x), generate_series(0, 7) AS py(y)
      JOIN a aa ON aa.au = c.cu AND aa.ax = px.x
      JOIN a ab ON ab.au = c.cv AND ab.ax = py.y
      GROUP BY 1, 2, 3, 4, 5, 6),
    yplane AS (
      SELECT media_id, mw, mh,
             (bi % (2*mw)) * 8 + x AS gx, (bi // (2*mw)) * 8 + y AS gy,
             greatest(0, least(255, 128 + {fd})) AS yy
      FROM yterms),
    cb AS (
      SELECT media_id, mw, mh, b.b AS mi
      FROM m, generate_series(0, 3) AS b(b) WHERE b.b < mw * mh),
    ccoefs AS (
      SELECT media_id, mw, mi, comp.c AS c, cm.cu, cm.cv,
             (CASE WHEN cm.zi = 0 THEN ((media_id*7 + mi*5 + comp.c*17) % 13) - 6
                   ELSE ((media_id*11 + mi*3 + comp.c*29 + cm.zi) % 9) - 4 END)
             * cm.q1 AS cq
      FROM cb, cm, generate_series(1, 2) AS comp(c)),
    cterms AS (
      SELECT co.media_id, co.mw, co.mi, co.c, px.x AS x, py.y AS y,
             CAST(sum(co.cq * aa.aval * ab.aval) AS BIGINT) AS t
      FROM ccoefs co, generate_series(0, 7) AS px(x), generate_series(0, 7) AS py(y)
      JOIN a aa ON aa.au = co.cu AND aa.ax = px.x
      JOIN a ab ON ab.au = co.cv AND ab.ax = py.y
      GROUP BY 1, 2, 3, 4, 5, 6),
    cplane AS (
      SELECT media_id, (mi % mw) * 8 + x AS cx, (mi // mw) * 8 + y AS cy,
             max(CASE WHEN c = 1 THEN p END) AS cbv,
             max(CASE WHEN c = 2 THEN p END) AS crv
      FROM (SELECT media_id, mw, mi, c, x, y,
                   greatest(0, least(255, 128 + {fd})) AS p
            FROM cterms)
      GROUP BY 1, 2, 3),
    rgb AS (
      SELECT yp.media_id, yp.mw, yp.mh, yp.gx, yp.gy,
             greatest(0, least(255, yy + ({fd16("91881 * (crv - 128)")}))) AS r,
             greatest(0, least(255, yy - ({fd16("22554 * (cbv - 128) + 46802 * (crv - 128)")}))) AS g,
             greatest(0, least(255, yy + ({fd16("116130 * (cbv - 128)")}))) AS b
      FROM yplane yp JOIN cplane cp
        ON cp.media_id = yp.media_id AND cp.cx = yp.gx // 2 AND cp.cy = yp.gy)
    SELECT media_id, CAST(mw * 16 AS INT) AS width, CAST(mh * 8 AS INT) AS height,
           CAST(sum(r) AS BIGINT) AS r_sum,
           CAST(sum(g) AS BIGINT) AS g_sum,
           CAST(sum(b) AS BIGINT) AS b_sum,
           CAST(max(CASE WHEN gx = 0 AND gy = 0 THEN r END) AS INT) AS top_left_r
    FROM rgb GROUP BY 1, 2, 3
    """


@_candidate(
    "multimodal_jpeg_422",
    _jpeg_422_oracle(),
    "baseline 4:2:2 YCbCr JPEG (Y sampled 2x1 — two luma blocks + "
    "half-horizontal chroma per 16x8 MCU) through the generalized MCU "
    "walker; oracle = the 4:2:0 form with (gx div 2, gy) chroma map",
)
def multimodal_jpeg_422(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_jpeg_422(i, 1 + i % 2, 1 + (i // 2) % 2)),
        media_type="image/jpeg",
    )
    return MM.jpeg_color_features(media)


def _gif_oracle_ref() -> str:
    from query_engine_spark.registry import REGISTRY

    return REGISTRY["multimodal_gif"].oracle


@_candidate(
    "multimodal_gif_interlaced",
    _gif_oracle_ref(),
    "INTERLACED GIF with LOCAL color tables (alternating by doc_id): the "
    "4-pass de-interlace and the LCT override are transport, so "
    "multimodal_gif's oracle applies verbatim",
)
def multimodal_gif_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids,
            lambda i: MM.make_gif(
                i, 28 + i % 5, 18 + i % 4,
                interlace=True, local_palette=bool(i % 2),
            ),
        ),
        media_type="image/gif",
    )
    return MM.gif_features(media)


def _png_oracle_ref() -> str:
    from query_engine_spark.registry import REGISTRY

    return REGISTRY["multimodal_png"].oracle


@_candidate(
    "multimodal_png_adam7",
    _png_oracle_ref(),
    "ADAM7 interlaced PNG: seven independently-filtered passes are "
    "transport, so multimodal_png's oracle applies verbatim",
)
def multimodal_png_adam7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM
    from query_engine_spark.registry import REGISTRY

    # mirror multimodal_png's fixture dims exactly (oracle reuse)
    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids, lambda i: MM.make_png(i, 4 + i % 5, 3 + i % 4, interlace=True)
        ),
        media_type="image/png",
    )
    return MM.png_features(media)


@_candidate(
    "multimodal_bmp8",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 20 + doc_id % 5 AS width, 15 + doc_id % 4 AS height
      FROM documents WHERE doc_id < 64),
    px AS (
      SELECT m.media_id, m.width, m.height,
             (m.media_id*31 + y.y*7 + x.x*3) % 256 AS idx
      FROM m, generate_series(0, 18) AS y(y), generate_series(0, 24) AS x(x)
      WHERE y.y < m.height AND x.x < m.width)
    SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(sum(idx) AS BIGINT) AS idx_sum,
           CAST(sum((idx*7) % 256 + (idx*3) % 256 + idx) AS BIGINT) AS rgb_sum,
           CAST(media_id*31 % 256 AS INT) AS top_left_idx
    FROM px GROUP BY media_id, width, height
    """,
    "8-bpp PALETTE BMP (BGRA table, bottom-up stride rows) — the "
    "non-24-bpp boundary; oracle predicts index and palette-RGB sums by "
    "integer arithmetic like the GIF form",
)
def multimodal_bmp8(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from typing import Iterator

    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_bmp8(i, 20 + i % 5, 15 + i % 4)),
        media_type="image/bmp",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["payload"]):
                w, h, isum, rsum, tl = MM.decode_bmp8(bytes(blob))
                rows.append({
                    "media_id": mid, "width": w, "height": h,
                    "idx_sum": isum, "rgb_sum": rsum, "top_left_idx": tl,
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "idx_sum", "rgb_sum", "top_left_idx",
            ])

    return media.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, width int, height int, idx_sum long, rgb_sum long, top_left_idx int",
    )


@_candidate(
    "multimodal_gif_animated",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 10 + doc_id % 5 AS w, 8 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 48),
    px AS (
      SELECT m.media_id, f.f AS fi, m.w, m.h,
             (m.media_id*31 + f.f*97 + y.y*7 + x.x*3) % 256 AS v
      FROM m, generate_series(0, 2) AS f(f),
           generate_series(0, 11) AS y(y), generate_series(0, 14) AS x(x)
      WHERE y.y < m.h AND x.x < m.w)
    SELECT media_id, CAST(fi AS INT) AS frame_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS idx_sum,
           CAST(sum(v + (v*3) % 256 + (v*7) % 256) AS BIGINT) AS rgb_sum,
           CAST((media_id*31 + fi*97) % 256 AS INT) AS top_left_idx
    FROM px GROUP BY media_id, fi, w, h
    """,
    "REAL ANIMATED-GIF decode — the web-crawl shape: NETSCAPE looping "
    "extension skipped per spec, Graphic Control Extensions PARSED (not "
    "skipped) so transparency / restore-previous disposal raise the "
    "honest compositing boundary, every full-frame image descriptor "
    "LZW-decoded, one row per frame with palette-folded features "
    "(llmdata/multimodal.py make_gif_animated/decode_gif_frames/"
    "gif_frame_features)",
)
def multimodal_gif_animated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_gif_animated(i, 10 + i % 5, 8 + i % 4, 3)),
        media_type="image/gif",
    )
    return MM.gif_frame_features(media)


@_candidate(
    "multimodal_png_gray",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 64),
    px AS (
      SELECT m.media_id, m.w, m.h,
             (m.media_id*31 + y.y*7 + x.x*3) % 256 AS v
      FROM m, generate_series(0, 5) AS y(y), generate_series(0, 7) AS x(x)
      WHERE y.y < m.h AND x.x < m.w)
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(media_id*31 % 256 AS INT) AS top_left
    FROM px GROUP BY media_id, w, h
    """,
    "REAL GRAYSCALE PNG decode (color type 0 — one byte per pixel through "
    "the same five-filter unfiltering; odd media are ADAM7 interlaced, so "
    "the driver path exercises the per-pass scatter at 1 byte/px too); "
    "oracle = the BMP8/GIF index-formula arithmetic "
    "(llmdata/multimodal.py make_png(color_type=0)/decode_png_pixels)",
)
def multimodal_png_gray(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids,
            lambda i: MM.make_png(
                i, 4 + i % 5, 3 + i % 4, color_type=0, interlace=bool(i % 2)
            ),
        ),
        media_type="image/png",
    )
    return MM.png_features(media)


@_candidate(
    "multimodal_png_rgba",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 64),
    px AS (
      SELECT m.media_id, m.w, m.h,
             (m.media_id*31 + y.y*7 + x.x*3 + c.c) % 256 AS v
      FROM m, generate_series(0, 5) AS y(y), generate_series(0, 7) AS x(x),
           generate_series(0, 3) AS c(c)
      WHERE y.y < m.h AND x.x < m.w)
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(media_id*31 % 256 AS INT) AS top_left
    FROM px GROUP BY media_id, w, h
    """,
    "REAL RGBA PNG decode (color type 6 — the screenshot/web-asset shape: "
    "4 bytes per pixel through the same five-filter unfiltering, alpha as "
    "channel 3 of the formula; odd media ADAM7 interlaced so the per-pass "
    "scatter runs at 4 bytes/px) (llmdata/multimodal.py "
    "make_png(color_type=6)/decode_png_pixels)",
)
def multimodal_png_rgba(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids,
            lambda i: MM.make_png(
                i, 4 + i % 5, 3 + i % 4, color_type=6, interlace=bool(i % 2)
            ),
        ),
        media_type="image/png",
    )
    return MM.png_features(media)


@_candidate(
    "multimodal_png_palette",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 64),
    px AS (
      SELECT m.media_id, m.w, m.h,
             (m.media_id*31 + y.y*7 + x.x*3) % 256 AS i
      FROM m, generate_series(0, 5) AS y(y), generate_series(0, 7) AS x(x)
      WHERE y.y < m.h AND x.x < m.w)
    SELECT media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(i + (i*3) % 256 + (i*7) % 256) AS BIGINT) AS px_sum,
           CAST(media_id*31 % 256 AS INT) AS top_left
    FROM px GROUP BY media_id, w, h
    """,
    "REAL PALETTE PNG decode (color type 3 — the web-graphics shape: PLTE "
    "table, 8-bit indices through the five-filter unfiltering, indices "
    "FOLDED through the palette with out-of-range rejection; odd media "
    "ADAM7 interlaced); the palette is the GIF fixture's (i, 3i, 7i) "
    "table, so the oracle folds the index formula through the same "
    "arithmetic (llmdata/multimodal.py make_png(color_type=3))",
)
def multimodal_png_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids,
            lambda i: MM.make_png(
                i, 4 + i % 5, 3 + i % 4, color_type=3, interlace=bool(i % 2)
            ),
        ),
        media_type="image/png",
    )
    return MM.png_features(media)


# ---------------------------------------------------------------------------
# audio containers: one SQL form, four transports


def _pcm_first_sample_fix(n_expr: str, rate_expr: str, id_cap: int = 64) -> str:
    """first_sample must be sample 0 exactly, not a max over matches —
    compute it directly from the formula."""
    return f"""
    WITH m AS (SELECT doc_id AS media_id, {n_expr} AS n, {rate_expr} AS rate
               FROM documents WHERE doc_id < {id_cap}),
    s AS (
      SELECT m.media_id, m.rate, m.n,
             ((m.media_id*131 + i.i*17) % 65536) - 32768 AS v
      FROM m, generate_series(0, 1999) AS i(i) WHERE i.i < m.n)
    SELECT media_id, CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS amp_sum,
           CAST(max(v) AS INT) AS peak,
           CAST(((media_id*131) % 65536) - 32768 AS INT) AS first_sample
    FROM s GROUP BY media_id
    """


@_candidate(
    "multimodal_audio_flac",
    _pcm_first_sample_fix("600 + doc_id % 7 * 100", "8000 + doc_id % 4 * 4000"),
    "REAL FLAC decode (frames, fixed predictors, rice partitions, CRCs, "
    "STREAMINFO MD5) of the make_wav sample formula — compression is "
    "transport, so the WAV oracle arithmetic applies",
)
def multimodal_audio_flac(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_flac(i, 600 + i % 7 * 100, 8000 + i % 4 * 4000)),
        media_type="audio/flac",
    )
    return MM.flac_features(media)


@_candidate(
    "multimodal_audio_flac_stereo",
    # n_samples reports INTERCHANNEL frames (the FLAC STREAMINFO contract)
    # while amp_sum/peak/first cover the full interleaved stream (2n)
    """
    WITH m AS (SELECT doc_id AS media_id, 400 + doc_id % 5 * 100 AS n, 16000 AS rate
               FROM documents WHERE doc_id < 64),
    s AS (
      SELECT m.media_id, m.rate, m.n,
             ((m.media_id*131 + i.i*17) % 65536) - 32768 AS v
      FROM m, generate_series(0, 1999) AS i(i) WHERE i.i < 2 * m.n)
    SELECT media_id, CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS amp_sum,
           CAST(max(v) AS INT) AS peak,
           CAST(((media_id*131) % 65536) - 32768 AS INT) AS first_sample
    FROM s GROUP BY media_id
    """,
    "REAL STEREO FLAC decode (per-frame cheapest of independent / "
    "left-side / side-right / mid-side decorrelation, 17-bit side "
    "subframes): the interleaved stream IS the mono formula stream at 2n "
    "samples, so the same oracle covers it",
)
def multimodal_audio_flac_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))

    def maker(i: int) -> bytes:
        n = 400 + i % 5 * 100
        inter = [((i * 131 + k * 17) % 65536) - 32768 for k in range(2 * n)]
        return MM.encode_flac(inter, 16000, frame_size=128, channels=2)

    media = MM.attach_media_meta(
        _pack_media(ids, maker), media_type="audio/flac"
    )
    return MM.flac_features(media)


@_candidate(
    "multimodal_audio_aiff",
    _pcm_first_sample_fix("500 + doc_id % 6 * 80", "8000 + doc_id % 3 * 8000"),
    "REAL AIFF decode (FORM walk, 80-bit extended-float rate, big-endian "
    "PCM honoring the SSND offset) of the make_wav formula",
)
def multimodal_audio_aiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_aiff(i, 500 + i % 6 * 80, 8000 + i % 3 * 8000)),
        media_type="audio/aiff",
    )
    return MM.aiff_features(media)


@_candidate(
    "multimodal_audio_sphere",
    _pcm_first_sample_fix("500 + doc_id % 6 * 80", "16000"),
    "REAL NIST SPHERE decode (TIMIT-family ASCII header, typed fields, "
    "declared byte order) of the make_wav formula",
)
def multimodal_audio_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_sphere(i, 500 + i % 6 * 80, 16000)),
        media_type="audio/x-nist",
    )
    return MM.sphere_features(media)


@_candidate(
    "llm_curation_pipeline_scrub",
    r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact: u' || doc_id || '@example.com or +1 555 000 '
                  || doc_id AS text
      FROM documents),
    red AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]{1,320}@[A-Za-z0-9.-]{1,255}\.[A-Za-z]{2,24}', '<EMAIL>', 'g'),
                 '\+?[0-9][0-9()\- ]{7,30}[0-9]', '<PHONE>', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS text
      FROM aug),
    tok AS (
      SELECT doc_id, text,
             len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS n
      FROM red)
    SELECT doc_id, md5(text) AS text_fp
    FROM tok
    WHERE n >= 40 AND n <= 90
      AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < 5000
    """,
    "curation pipeline with the three new scrub-stage ops: pii_redact "
    "(in-place regex scrub of synthetic emails/phones appended per doc), "
    "token_filter (post-redaction whitespace-token bounds, both ends "
    "exercised), and sample (deterministic md5-bucket downsample — "
    "reproducible across engines, unlike rand()). All three are pure "
    "column expressions folded into ONE lazy map-only plan by "
    "translate_curation_pipeline; the oracle chains the identical "
    "regex/tokenize/bucket forms (llmdata/pipeline.py)",
)
def llm_curation_pipeline_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata.pipeline import translate_curation_pipeline

    docs = load_table(spark, sf_dir, "documents")
    with_pii = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact: u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 000 "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    run = translate_curation_pipeline(
        [
            {"op": "pii_redact"},
            {"op": "token_filter", "min_tokens": 40, "max_tokens": 90},
            {"op": "sample", "rate": 0.5},
        ]
    )
    out = run(with_pii)
    return out.select("doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("text_fp"))


@_candidate(
    "multimodal_tiff_multipage",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 16 + doc_id % 5 AS w, 12 + doc_id % 4 AS h
      FROM documents WHERE doc_id < 48),
    px AS (
      SELECT m.media_id, p.p AS p, m.w, m.h,
             (m.media_id*31 + p.p*97 + y.y*7 + x.x*3) % 256 AS v
      FROM m, generate_series(0, 2) AS p(p),
           generate_series(0, 15) AS y(y), generate_series(0, 20) AS x(x)
      WHERE y.y < m.h AND x.x < m.w)
    SELECT media_id, CAST(p AS INT) AS page_idx,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST((media_id*31 + p*97) % 256 AS INT) AS top_left
    FROM px GROUP BY media_id, p, w, h
    """,
    "REAL multi-page TIFF decode (the scanned-document corpus shape): one "
    "IFD per page linked by the next-IFD pointer, each page with its OWN "
    "Compression tag (none/PackBits/LZW cycling by page, so the walker "
    "must re-read every IFD), both byte orders cycling by media parity, "
    "cycle-guarded chain walk. One media row in, one row per page out — "
    "the frame-features shape for documents (llmdata/multimodal.py "
    "make_tiff_multipage/decode_tiff_pages/tiff_page_features)",
)
def multimodal_tiff_multipage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(
            ids,
            lambda i: MM.make_tiff_multipage(
                i, 16 + i % 5, 12 + i % 4, 3, byte_order="II" if i % 2 == 0 else "MM"
            ),
        ),
        media_type="image/tiff",
    )
    return MM.tiff_page_features(media)


def _mp4_mjpeg_oracle() -> str:
    """The grayscale-JPEG oracle arithmetic (registry._jpeg_oracle) with a
    frame dimension: frame fi of media m decodes the coefficient formula at
    derived key k = m*131 + fi*17, through the same literal IDCT basis
    table and floor rounding. Sampling mirrors multimodal_video_frames:
    every 2nd frame of 6, capped at 3 (fi in 0, 2, 4)."""
    from query_engine_spark.llmdata.multimodal import (
        _JPEG_IDCT_A,
        _JPEG_QTAB,
        _JPEG_ZIGZAG,
    )

    a_rows = ", ".join(
        f"({u}, {x}, {_JPEG_IDCT_A[u][x]})" for u in range(8) for x in range(8)
    )
    used = [0, 1, 3, 8, 20, 40, 55]  # jpeg_qcoefs' nonzero zigzag indices
    cmap = ", ".join(
        f"({i}, {_JPEG_ZIGZAG[i] % 8}, {_JPEG_ZIGZAG[i] // 8}, {_JPEG_QTAB[i]})"
        for i in used
    )
    half, full = 1 << 25, 1 << 26
    fd = (
        f"((t + {half}) // {full}) - (CASE WHEN (t + {half}) % {full} != 0 "
        f"AND t + {half} < 0 THEN 1 ELSE 0 END)"
    )
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, 2 + doc_id % 2 AS bw, 2 + (doc_id // 2) % 2 AS bh
      FROM documents WHERE doc_id < 48),
    mf AS (
      SELECT media_id, bw, bh, f.f * 2 AS fi, media_id*131 + f.f*2*17 AS k
      FROM m, generate_series(0, 2) AS f(f)),
    blocks AS (
      SELECT media_id, bw, bh, fi, k, b.b AS bi
      FROM mf, generate_series(0, 8) AS b(b) WHERE b.b < bw * bh),
    cm(zi, cu, cv, q) AS (VALUES {cmap}),
    coefs AS (
      SELECT media_id, bw, bh, fi, bi, cm.cu, cm.cv,
             (CASE WHEN cm.zi = 0 THEN ((k*7 + bi*5) % 13) - 6
                   ELSE ((k*11 + bi*3 + cm.zi) % 9) - 4 END) * cm.q AS cq
      FROM blocks, cm),
    a(au, ax, aval) AS (VALUES {a_rows}),
    terms AS (
      SELECT c.media_id, c.bw, c.bh, c.fi, c.bi, px.x AS x, py.y AS y,
             CAST(sum(c.cq * aa.aval * ab.aval) AS BIGINT) AS t
      FROM coefs c, generate_series(0, 7) AS px(x), generate_series(0, 7) AS py(y)
      JOIN a aa ON aa.au = c.cu AND aa.ax = px.x
      JOIN a ab ON ab.au = c.cv AND ab.ax = py.y
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    pix AS (
      SELECT media_id, bw, bh, fi, bi, x, y,
             greatest(0, least(255, 128 + {fd})) AS p
      FROM terms)
    SELECT media_id, CAST(fi AS INT) AS frame_idx,
           CAST(bw * 8 AS INT) AS width, CAST(bh * 8 AS INT) AS height,
           CAST(sum(p) AS BIGINT) AS px_sum,
           CAST(max(CASE WHEN bi = 0 AND x = 0 AND y = 0 THEN p END) AS INT) AS top_left
    FROM pix GROUP BY 1, 2, 3, 4
    """


@_candidate(
    "multimodal_video_mp4",
    _mp4_mjpeg_oracle(),
    "REAL MP4/MOV demux + MJPEG decode: ISO BMFF box walk, stsd "
    "sample-entry validation, stsc chunk-run expansion against stco "
    "absolute offsets and stsz sizes (2-per-chunk layout with odd tails; "
    "mdat/moov order flips by media parity), then the hash-verified "
    "baseline-JPEG decode per sampled frame — the oracle predicts every "
    "pixel of every sampled frame from the coefficient formula at the "
    "per-frame derived key. Transform codecs (avc1/hvc1/mp4v) raise the "
    "honest boundary (llmdata/multimodal.py make_mp4_mjpeg/demux_mp4/"
    "mp4_frame_features)",
)
def multimodal_video_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_mp4_mjpeg(i, 6)),
        media_type="video/mp4",
    )
    return MM.mp4_frame_features(media, every_n=2, max_frames=3)


@_candidate(
    "llm_curation_pipeline_balance",
    r"""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    m AS (SELECT min(n) AS n_min FROM c),
    bal AS (
      SELECT d.doc_id, d.source, d.text
      FROM documents d JOIN c USING (source) CROSS JOIN m
      WHERE (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000) * c.n
            < m.n_min * 10000),
    tok AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), '\s+')) AS n
      FROM bal)
    SELECT doc_id, source FROM tok WHERE n >= 40
    """,
    "curation pipeline with the balance stage: every source stratum capped "
    "at ~the smallest stratum's size (counts computed over the STAGE "
    "INPUT, broadcast back onto the scan; keep-test is exact int64 bucket "
    "math — no float thresholds), composed with a downstream token_filter. "
    "The oracle replays the count/min/bucket arithmetic then the token "
    "bound (llmdata/pipeline.py + textstats.balanced_sample)",
)
def llm_curation_pipeline_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata.pipeline import translate_curation_pipeline

    docs = load_table(spark, sf_dir, "documents")
    run = translate_curation_pipeline(
        [
            {"op": "balance", "strat_col": "source"},
            {"op": "token_filter", "min_tokens": 40},
        ]
    )
    return run(docs.select("doc_id", "source", "text")).select("doc_id", "source")


def _mp4_video_dedup_oracle() -> str:
    """The full composition chain for compressed-video near-dup: per-frame
    JPEG pixels by the integer IDCT (frame key pat*131 + fi*17), per-frame
    grayscale dHash (9×8 grid, gradient bits, 4×16-bit bands), distinct
    hash sets per video, containment join on the full 64-bit hash — the
    `media_video_dedup` shape over a LOSSY compressed corpus. Ids 24-35
    are planted copies of patterns 0-11 with DIFFERENT frame counts
    (clipped copies) and different container layouts."""
    from query_engine_spark.llmdata.multimodal import (
        _JPEG_IDCT_A,
        _JPEG_QTAB,
        _JPEG_ZIGZAG,
    )

    a_rows = ", ".join(
        f"({u}, {x}, {_JPEG_IDCT_A[u][x]})" for u in range(8) for x in range(8)
    )
    used = [0, 1, 3, 8, 20, 40, 55]
    cmap = ", ".join(
        f"({i}, {_JPEG_ZIGZAG[i] % 8}, {_JPEG_ZIGZAG[i] // 8}, {_JPEG_QTAB[i]})"
        for i in used
    )
    half, full = 1 << 25, 1 << 26
    fd = (
        f"((t + {half}) // {full}) - (CASE WHEN (t + {half}) % {full} != 0 "
        f"AND t + {half} < 0 THEN 1 ELSE 0 END)"
    )
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, doc_id % 24 AS pat,
             2 + (doc_id % 24) % 2 AS bw, 2 + ((doc_id % 24) // 2) % 2 AS bh,
             4 + (doc_id % 5) % 3 AS nf
      FROM documents WHERE doc_id < 36),
    mf AS (
      SELECT media_id, pat, bw, bh, f.f AS fi, pat*131 + f.f*17 AS k
      FROM m, generate_series(0, 5) AS f(f) WHERE f.f < nf),
    blocks AS (
      SELECT media_id, bw, bh, fi, k, b.b AS bi
      FROM mf, generate_series(0, 8) AS b(b) WHERE b.b < bw * bh),
    cm(zi, cu, cv, q) AS (VALUES {cmap}),
    coefs AS (
      SELECT media_id, bw, bh, fi, bi, cm.cu, cm.cv,
             (CASE WHEN cm.zi = 0 THEN ((k*7 + bi*5) % 13) - 6
                   ELSE ((k*11 + bi*3 + cm.zi) % 9) - 4 END) * cm.q AS cq
      FROM blocks, cm),
    a(au, ax, aval) AS (VALUES {a_rows}),
    terms AS (
      SELECT c.media_id, c.bw, c.bh, c.fi, c.bi, px.x AS x, py.y AS y,
             CAST(sum(c.cq * aa.aval * ab.aval) AS BIGINT) AS t
      FROM coefs c, generate_series(0, 7) AS px(x), generate_series(0, 7) AS py(y)
      JOIN a aa ON aa.au = c.cu AND aa.ax = px.x
      JOIN a ab ON ab.au = c.cv AND ab.ax = py.y
      GROUP BY 1, 2, 3, 4, 5, 6, 7),
    pix AS (
      SELECT media_id, bw, bh, fi,
             (bi % bw) * 8 + x AS px_x, (bi // bw) * 8 + y AS px_y,
             greatest(0, least(255, 128 + {fd})) AS p
      FROM terms),
    g AS (
      SELECT p.media_id, p.fi, gy.gy AS gy, gx.gx AS gx, p.p AS gray
      FROM pix p
      JOIN generate_series(0, 7) AS gy(gy) ON p.px_y = (gy.gy * (p.bh * 8)) // 8
      JOIN generate_series(0, 8) AS gx(gx) ON p.px_x = (gx.gx * (p.bw * 8)) // 9),
    bits AS (
      SELECT a2.media_id, a2.fi, a2.gy AS gy, a2.gx AS kk,
             CASE WHEN a2.gray > b2.gray THEN 1 ELSE 0 END AS bit
      FROM g a2 JOIN g b2 ON a2.media_id = b2.media_id AND a2.fi = b2.fi
                         AND a2.gy = b2.gy AND b2.gx = a2.gx + 1),
    bands AS (
      SELECT media_id, fi, (gy*8 + kk) // 16 AS band_id,
             CAST(sum(bit * (1 << ((gy*8 + kk) % 16))) AS BIGINT) AS val
      FROM bits GROUP BY 1, 2, 3),
    wide AS (
      SELECT media_id, fi,
             CAST(max(CASE WHEN band_id = 0 THEN val END) AS BIGINT) AS b0,
             CAST(max(CASE WHEN band_id = 1 THEN val END) AS BIGINT) AS b1,
             CAST(max(CASE WHEN band_id = 2 THEN val END) AS BIGINT) AS b2,
             CAST(max(CASE WHEN band_id = 3 THEN val END) AS BIGINT) AS b3
      FROM bands GROUP BY 1, 2),
    sig AS (SELECT DISTINCT media_id, b0, b1, b2, b3 FROM wide)
    SELECT a4.media_id AS media_a, b4.media_id AS media_b,
           CAST(count(*) AS BIGINT) AS n_common
    FROM sig a4 JOIN sig b4
      ON a4.b0 = b4.b0 AND a4.b1 = b4.b1 AND a4.b2 = b4.b2 AND a4.b3 = b4.b3
     AND a4.media_id < b4.media_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY media_a, media_b
    """


@_candidate(
    "media_mp4_video_dedup",
    _mp4_video_dedup_oracle(),
    "PERCEPTUAL video near-dup over a COMPRESSED corpus — the web-crawl "
    "video shape: MP4/MJPEG payloads (ids 24-35 planted as CLIPPED copies "
    "of patterns 0-11, different frame counts AND different container "
    "layouts) are demuxed via the sample tables, every frame Huffman-decoded "
    "+ integer-IDCT'd and dHashed in one map-only Arrow pass, then the "
    "frame-hash containment join of media_video_dedup — only 8-byte "
    "hashes ever leave the executor. The oracle chains the verified "
    "per-frame IDCT CTEs into the verified dHash/band/containment CTEs "
    "(llmdata/multimodal.py mp4_video_frame_hashes + video_dedup_pairs)",
)
def media_mp4_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 36).select(F.col("doc_id").alias("media_id"))
    media = _pack_media(
        ids,
        lambda i: MM.make_mp4_mjpeg(i, 4 + (i % 5) % 3, pattern=i % 24),
    )
    hashes = MM.mp4_video_frame_hashes(media, every_n=1, max_frames=8)
    return MM.video_dedup_pairs(hashes, min_common=2).orderBy("media_a", "media_b")


@_candidate(
    "multimodal_video_avi_mjpeg",
    _mp4_mjpeg_oracle(),
    "MJPEG-in-AVI demux + decode (the legacy webcam/capture-card shape): "
    "'00dc' chunks carrying complete baseline JPEGs, strf biCompression "
    "= 'MJPG'. The per-frame content formula matches make_mp4_mjpeg, so "
    "the MP4 oracle applies VERBATIM — container is transport "
    "(llmdata/multimodal.py make_avi_mjpeg/demux_avi_mjpeg/"
    "avi_mjpeg_frame_features)",
)
def multimodal_video_avi_mjpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 48).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_avi_mjpeg(i, 6)),
        media_type="video/x-msvideo",
    )
    return MM.avi_mjpeg_frame_features(media, every_n=2, max_frames=3)


@_candidate(
    "multimodal_audio_alaw",
    """
    WITH m AS (SELECT doc_id AS media_id, 400 + (doc_id % 5) * 50 AS n
               FROM documents WHERE doc_id < 64),
    s AS (SELECT media_id, n, j.j AS j,
                 xor((media_id*11 + j.j*5) % 256, 85) AS inv
          FROM m, generate_series(0, 599) AS j(j) WHERE j.j < n),
    mag AS (SELECT media_id, n, j, inv,
              CASE WHEN (inv & 112) = 0 THEN ((inv & 15) << 4) + 8
                   WHEN (inv & 112) = 16 THEN ((inv & 15) << 4) + 264
                   ELSE (((inv & 15) << 4) + 264) << (((inv & 112) >> 4) - 1)
              END AS t
            FROM s),
    d AS (SELECT media_id, n, j,
                 CASE WHEN (inv & 128) != 0 THEN t ELSE -t END AS sample
          FROM mag)
    SELECT media_id, 8000 AS sample_rate,
           CAST(any_value(n) AS BIGINT) AS n_samples,
           CAST(sum(sample) AS BIGINT) AS amp_sum,
           CAST(max(sample) AS INT) AS peak,
           CAST(max(CASE WHEN j = 0 THEN sample END) AS INT) AS first_sample
    FROM d GROUP BY 1
    """,
    "REAL G.711 A-law decode (format tag 6 — the European telephony "
    "sibling of the hash-green mu-law query): XOR-0x55 even-bit "
    "uninversion, mantissa rebuild, segment shift with the 0/1 special "
    "cases, inverted sign convention. Stateless per byte, so the oracle "
    "is a CASE expression; the fixture formula (11,5) differs from "
    "mu-law's (13,7) so the two expansions cannot be confused "
    "(llmdata/multimodal.py make_wav_alaw/decode_wav_alaw/alaw_features)",
)
def multimodal_audio_alaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_wav_alaw(i, 400 + (i % 5) * 50)),
        media_type="audio/PCMA",
    )
    return MM.alaw_features(media)


@_candidate(
    "multimodal_audio_wav_stereo",
    # the stereo-FLAC oracle applies VERBATIM: same interleaved formula
    # stream at 2n, same frames-vs-samples convention — container is
    # transport
    """
    WITH m AS (SELECT doc_id AS media_id, 400 + doc_id % 5 * 100 AS n, 16000 AS rate
               FROM documents WHERE doc_id < 64),
    s AS (
      SELECT m.media_id, m.rate, m.n,
             ((m.media_id*131 + i.i*17) % 65536) - 32768 AS v
      FROM m, generate_series(0, 1999) AS i(i) WHERE i.i < 2 * m.n)
    SELECT media_id, CAST(max(rate) AS INT) AS sample_rate,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(abs(v)) AS BIGINT) AS amp_sum,
           CAST(max(v) AS INT) AS peak,
           CAST(((media_id*131) % 65536) - 32768 AS INT) AS first_sample
    FROM s GROUP BY media_id
    """,
    "REAL stereo PCM WAV decode: 2-channel 16-bit frames with block_align/"
    "byte_rate consistency checks and the frames-vs-interleaved-samples "
    "convention shared with stereo FLAC, whose oracle applies verbatim "
    "(llmdata/multimodal.py make_wav_stereo/decode_wav_stereo/"
    "wav_stereo_features)",
)
def multimodal_audio_wav_stereo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    media = MM.attach_media_meta(
        _pack_media(ids, lambda i: MM.make_wav_stereo(i, 400 + i % 5 * 100, 16000)),
        media_type="audio/wav",
    )
    return MM.wav_stereo_features(media)


# ---------------------------------------------------------------------------
# TIFF: compression/byte-order transport over the BMP/GIF pixel formula


@_candidate(
    "multimodal_tiff",
    """
    WITH m AS (
      SELECT doc_id AS media_id, 20 + doc_id % 5 AS width, 15 + doc_id % 4 AS height
      FROM documents WHERE doc_id < 64),
    px AS (
      SELECT m.media_id, m.width, m.height,
             (m.media_id*31 + y.y*7 + x.x*3) % 256 AS p
      FROM m, generate_series(0, 18) AS y(y), generate_series(0, 24) AS x(x)
      WHERE y.y < m.height AND x.x < m.width)
    SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
           CAST(sum(p) AS BIGINT) AS px_sum,
           CAST(media_id*31 % 256 AS INT) AS top_left
    FROM px GROUP BY media_id, width, height
    """,
    "REAL TIFF decode (typed IFD walk, ragged multi-strip reassembly, "
    "none/PackBits/early-change-LZW cycled by doc_id%3, II/MM byte order "
    "by doc_id%2) — compression and byte order are transport over the "
    "BMP/GIF pixel formula",
)
def multimodal_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import multimodal as MM

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 64).select(F.col("doc_id").alias("media_id"))
    comps = (1, 32773, 5)

    def maker(i: int) -> bytes:
        return MM.make_tiff(
            i, 20 + i % 5, 15 + i % 4,
            compression=comps[i % 3],
            byte_order="II" if i % 2 == 0 else "MM",
        )

    media = MM.attach_media_meta(_pack_media(ids, maker), media_type="image/tiff")
    return MM.tiff_features(media)


# ---------------------------------------------------------------------------
# WARC crawl ingest: oracle predicts the extracted text from the template


@_candidate(
    "llm_warc_ingest",
    """
    WITH w AS (SELECT doc_id AS warc_id FROM documents WHERE doc_id < 32),
    pages AS (
      SELECT w.warc_id, CAST(p.p AS INT) AS page
      FROM w, generate_series(0, 2) AS p(p)),
    expected AS (
      SELECT warc_id,
             'http://site' || (warc_id % 7) || '.example/d/' || page
               || '?id=' || page AS url,
             200 AS http_status,
             'T Doc ' || warc_id || '-' || page || chr(10)
               || 'alpha ' || (warc_id*13 + page*7) % 97 || ' beta' || chr(10)
               || 'tail & done' AS text
      FROM pages)
    SELECT warc_id, url, CAST(http_status AS INT) AS http_status,
           md5(text) AS text_fp
    FROM expected
    ORDER BY warc_id, url
    """,
    "WARC crawl ingestion end to end: gzip-member WARC fixtures -> "
    "response records -> HTTP envelope strip -> html_to_text (column "
    "expressions) -> canonical_url (tracking-param drop, default-port "
    "strip, lowercase host). The oracle predicts the EXTRACTED text by "
    "string concatenation from the deterministic page template — first "
    "principles, not regex replay (llmdata/warc.py)",
)
def llm_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_engine_spark.llmdata import warc as W

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.filter(F.col("doc_id") < 32).select(F.col("doc_id").alias("warc_id"))

    def maker(i: int) -> bytes:
        recs = [{"type": "warcinfo", "body": b"software: fixture\r\n"}]
        for p in range(3):
            url = f"HTTP://Site{i % 7}.Example:80/d/{p}?utm_source=x&id={p}"
            body = (
                f"<html><head><title>T</title></head><body><h1>Doc {i}-{p}</h1>"
                f"<p>alpha {(i * 13 + p * 7) % 97} beta</p>"
                f"<script>var x = 1;</script>"
                f"<p>tail &amp; done</p></body></html>"
            ).encode()
            recs.append({"type": "request", "target_uri": url, "body": b"GET /\r\n"})
            recs.append({
                "type": "response", "target_uri": url,
                "content_type": "text/html; charset=utf-8", "body": body,
            })
        return W.make_warc(recs)

    from query_engine_spark.registry import _pack_media as rp

    packed = rp(ids.withColumnRenamed("warc_id", "media_id"), maker).select(
        F.col("media_id").alias("warc_id"), "payload"
    )
    return (
        W.warc_documents(packed)
        .select(
            "warc_id",
            W.canonical_url(F.col("url")).alias("url"),
            "http_status",
            F.md5(F.encode(W.html_to_text(F.col("text")), "utf-8")).alias("text_fp"),
        )
        .orderBy("warc_id", "url")
    )


# ---------------------------------------------------------------------------
# Round-8 registration: fold the now-complete candidate dict into the main
# registry. This callback runs at the END of this module body so the main
# registry always absorbs the full set, whichever module leads the import
# (see registry._absorb_r8_candidates for the circular-import rationale).
from query_engine_spark import registry as _registry  # noqa: E402

_registry._absorb_r8_candidates(CANDIDATES)
